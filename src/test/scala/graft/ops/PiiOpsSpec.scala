package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** PII regex-tier contract: staged redaction order, pattern edges the
  * harness variants don't cover, and redaction idempotence. */
class PiiOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def red(text: String): String =
    Seq(text).toDF("text").select(PiiOps.redact(col("text"))).head().getString(0)

  private def stats(text: String): (Long, Long, Long) = {
    val r = PiiOps.piiStats(Seq((1L, text)).toDF("doc_id", "text")).head()
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("redact: each pattern alone") {
    assert(red("mail bob.smith+tag@mail.example.org now") == "mail <EMAIL> now")
    assert(red("host 192.168.1.10 up") == "host <IP> up")
    assert(red("call +44 20-7946-0958 or (555) 123-4567") == "call <PHONE> or <PHONE>")
  }

  test("staged order: digit-bearing emails and IPs never also match as phones") {
    // the local part alone would match phoneRe (three dash-separated groups)
    assert(stats("a1234-5678-9012@x.com") == ((1L, 0L, 0L)))
    assert(red("a1234-5678-9012@x.com") == "<EMAIL>")
    // dots are not phone separators, so IPs can't double-match either way
    assert(stats("10.0.0.1") == ((0L, 1L, 0L)))
  }

  test("unbounded digit chains cannot overflow the regex engine") {
    // Java regex recurses per GROUP-quantifier iteration: the previous
    // unbounded phone tail threw StackOverflowError here at ~30k groups
    val chain = "12" + "-34" * 30000
    val out = red(chain)
    assert(!out.contains("StackOverflow")) // completing at all is the test
    assert(out.startsWith("<PHONE>"))      // redacts as consecutive phones
    assert(!out.exists(_.isLetter) || out.contains("<PHONE>"))
    // a real long-ish number still redacts as ONE phone (8 groups)
    assert(red("+49 30-1234-5678-90-12-34-56-78") == "<PHONE>")
  }

  test("pattern edges") {
    // recall-oriented IP: version strings are accepted by design
    assert(stats("lib 1.2.3.4 released") == ((0L, 1L, 0L)))
    // a phone needs >= 3 digit groups
    assert(stats("pages 12-34 cited") == ((0L, 0L, 0L)))
    // a TLD needs >= 2 letters
    assert(stats("ping a@b.c quickly") == ((0L, 0L, 0L)))
    // five dot-groups: \b holds between a digit and '.', so the first
    // four octets match and the tail survives — recall-oriented, pinned
    assert(red("v 1.2.3.4.5 x") == "v <IP>.5 x")
  }

  test("redaction is idempotent (placeholders carry no matchable content)") {
    val mixed = "Write a@b.co from 10.0.0.1 or dial 555-987-6543 now"
    assert(red(mixed) == "Write <EMAIL> from <IP> or dial <PHONE> now")
    assert(red(red(mixed)) == red(mixed))
  }
}
