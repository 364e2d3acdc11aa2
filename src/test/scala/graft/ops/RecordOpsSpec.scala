package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RecordOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("splitRecords: 1 doc -> N positioned 20-token chunks, round-trips") {
    val docs = Seq(
      (1L, (1 to 45).map(i => s"w$i").mkString(" ")), // 3 chunks (20+20+5)
      (2L, "one two three"),                          // 1 chunk
      (3L, (1 to 40).map(i => s"x$i").mkString(" "))  // exactly 2 chunks
    ).toDF("doc_id", "text")
    val got = RecordOps.splitRecords(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.count(_._1 == 1L) == 3)
    assert(got.count(_._1 == 2L) == 1)
    assert(got.count(_._1 == 3L) == 2)
    // chunk 0 has the first 20 tokens; concatenation restores the doc
    val d1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).mkString(" ")
    assert(d1 == (1 to 45).map(i => s"w$i").mkString(" "))
    assert(got.find(t => t._1 == 1L && t._2 == 2).get._3 ==
      (41 to 45).map(i => s"w$i").mkString(" "))
  }

  test("recordCheck: first failing rule wins, ok otherwise") {
    val ts = new java.sql.Timestamp(0L)
    val pages = Seq(
      ("https://a/1", ts, "body text", "en"),
      ("", ts, "body", "en"),
      ("https://a/3", ts, "", "en"),
      ("https://a/4", ts, "body", "xx"),
      ("https://a/5", null.asInstanceOf[java.sql.Timestamp], "body", "en")
    ).toDF("url", "warc_ts", "text", "lang")
    val got = RecordOps.recordCheck(pages, Seq("en", "de"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("https://a/1") == "ok")
    assert(got("") == "missing_url")
    assert(got("https://a/3") == "empty_text")
    assert(got("https://a/4") == "unknown_lang")
    assert(got("https://a/5") == "missing_ts")
  }

  test("scrubEmpty: drops null and '', keeps '0' (PHP-empty exception) and real values") {
    val df = Seq(1).toDF("x").select(
      RecordOps.scrubEmpty(array(lit("en"), lit(""), lit("0"),
        lit(null).cast("string"), lit("src"))).as("a"))
    assert(df.head().getSeq[String](0) == Seq("en", "0", "src"))
  }

  test("xpathFilter: keeps pages whose html satisfies the XPath") {
    val pages = Seq(
      ("https://a/1", "<html><body>alpha dup beta</body></html>".getBytes("UTF-8")),
      ("https://a/2", "<html><body>gamma delta</body></html>".getBytes("UTF-8"))
    ).toDF("url", "html")
    val got = RecordOps.xpathFilter(pages, """contains(//body, "dup")""")
      .select("url").collect().map(_.getString(0)).toSet
    assert(got == Set("https://a/1"))
    // single-quoted XPath string literals (standard XPath syntax) must
    // not break the SQL the expression is embedded in
    val gotSq = RecordOps.xpathFilter(pages, "contains(//body, 'delta')")
      .select("url").collect().map(_.getString(0)).toSet
    assert(gotSq == Set("https://a/2"))
  }
}
