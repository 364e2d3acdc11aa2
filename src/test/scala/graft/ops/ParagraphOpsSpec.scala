package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Sub-document dedup semantics, checked against an in-Scala brute
  * force over the same fixtures (paragraph split/trim/filter, global
  * first-occurrence survival, Gopher repetition fractions). */
class ParagraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 1: A, B        doc 2: B, C (B is a later occurrence)
  // doc 3: exact clone of doc 1 (vanishes entirely after dedup)
  // doc 4: empty + whitespace-only paragraphs (dropped)
  private val A = "alpha beta gamma"
  private val B = "shared boiler plate"
  private val C = "unique closing words"
  private lazy val fixture = Seq(
    (1L, s"$A\n\n$B"),
    (2L, s"$B\n\n$C"),
    (3L, s"$A\n\n$B"),
    (4L, s"  \n\n$C\n\n")).toDF("doc_id", "text")

  test("paragraphs: splits on blank line, trims, drops empties, keeps pos") {
    val got = ParagraphOps.paragraphs(fixture)
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 0, A), (1L, 1, B), (2L, 0, B), (2L, 1, C),
      (3L, 0, A), (3L, 1, B), (4L, 1, C)))
  }

  test("paragraphDupStats: per-doc totals and cross-corpus dup counts") {
    val got = ParagraphOps.paragraphDupStats(fixture)
      .as[(Long, Long, Long)].collect().toSet
    // A occurs 2x (docs 1,3), B 3x, C 2x (docs 2,4)
    assert(got == Set((1L, 2L, 2L), (2L, 2L, 2L), (3L, 2L, 2L), (4L, 1L, 1L)))
  }

  test("boilerplate: only paragraphs at/above the occurrence floor") {
    val got = ParagraphOps.boilerplate(fixture, minOcc = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq((md5Hex(B), 3L)))
    val all = ParagraphOps.boilerplate(fixture, minOcc = 2)
      .as[(String, Long)].collect().toMap
    assert(all == Map(md5Hex(A) -> 2L, md5Hex(B) -> 3L, md5Hex(C) -> 2L))
  }

  test("dedupParagraphs: global first occurrence survives; clones vanish") {
    val got = ParagraphOps.dedupParagraphs(fixture)
      .as[(Long, String)].collect().toMap
    // doc 1 keeps A and B (first occurrences); doc 2 keeps only C;
    // doc 3 (clone) keeps nothing and vanishes; doc 4's C seen in doc 2
    assert(got == Map(1L -> s"$A\n\n$B", 2L -> C))
  }

  test("dedupParagraphs preserves document order of survivors") {
    val df = Seq((1L, "z last\n\na first"), (2L, "z last\n\nmiddle one"))
      .toDF("doc_id", "text")
    val got = ParagraphOps.dedupParagraphs(df).as[(Long, String)].collect().toMap
    assert(got(1L) == "z last\n\na first") // pos order, not lexical
    assert(got(2L) == "middle one")
  }

  test("lineRepetitionStats matches a brute-force computation") {
    val docs = Seq(
      (1L, "a b\nc d\na b\n\ne f"), // "" from \n\n dropped; "a b" dup
      (2L, "solo line"),
      (3L, "x\nx\nx"),
      (4L, "")).toDF("doc_id", "text")
    val got = ParagraphOps.lineRepetitionStats(docs)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    def brute(text: String): (Long, Long, Long, Long) = {
      val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
      val n = lines.length.toLong
      val d = lines.distinct.length.toLong
      val counts = lines.groupBy(identity).view.mapValues(_.length).toMap
      val dupChars = lines.filter(l => counts(l) > 1).map(_.length.toLong).sum
      val totChars = lines.map(_.length.toLong).sum
      (n, d,
        if (n > 0) math.floor(1000.0 * (n - d) / n).toLong else 0L,
        if (totChars > 0) math.floor(1000.0 * dupChars / totChars).toLong else 0L)
    }
    for ((id, text) <- Seq(1L -> "a b\nc d\na b\n\ne f", 2L -> "solo line",
        3L -> "x\nx\nx", 4L -> "")) {
      val (n, d, lp, cp) = brute(text)
      assert(got(id) == ((id, n, d, lp, cp)), s"doc $id")
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
