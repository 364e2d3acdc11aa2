package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** C4 line/page rules (Raffel et al. 2020 §2.2) on hand fixtures:
  * per-line retention (terminal punctuation, word floor, javascript),
  * page gates (kept-line floor, bad phrases, brace), and the cleaned
  * reassembly. */
class C4FilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Long, String)] =
    C4Filter.c4LineFilter(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  private val good = Seq(
    "The first sentence has six words.",
    "Here is another proper prose sentence!",
    "Does this page read like running text?").mkString("\n")

  test("prose page passes; kept lines reassemble in order") {
    val m = run(1L -> good)
    assert(m(1L) == ((3L, 3L, 1L, good)))
  }

  test("line rules: word floor, terminal punctuation, javascript, quote end") {
    val text = Seq(
      "Too short.",                                     // 2 words: dropped
      "this line has no terminal punctuation at all",   // dropped
      "Please enable JavaScript to continue viewing.",  // dropped (case-insensitive)
      "He said it ends with a \"quote.\"",              // kept: closing quote
      "Exactly five words right here.",                 // kept: at the floor
      "A third keeper arrives just in time.").mkString("\n")
    val m = run(2L -> text)
    assert(m(2L)._1 == 6L && m(2L)._2 == 3L && m(2L)._3 == 1L)
    assert(m(2L)._4 ==
      "He said it ends with a \"quote.\"\nExactly five words right here.\nA third keeper arrives just in time.")
  }

  test("page gates: kept-line floor, lorem ipsum, brace") {
    val m = run(
      3L -> "Only two keepers live on this page.\nThe second keeper is right here.",
      4L -> (good + "\nLorem Ipsum dolor sit amet consectetur."),
      5L -> (good + "\nvar config = { key: 1 };"))
    assert(m(3L)._3 == 0L && m(3L)._2 == 2L) // below minKeptLines
    assert(m(4L)._3 == 0L)                   // bad phrase, case-insensitive
    assert(m(5L)._3 == 0L)                   // brace page
    // failing pages still emit their kept lines for line-only cleaning
    assert(m(4L)._4.startsWith(good))
  }

  test("empty and whitespace-only docs emit zeros, not nulls") {
    val m = run(6L -> "", 7L -> "  \n \n")
    assert(m(6L) == ((0L, 0L, 0L, "")) && m(7L) == ((0L, 0L, 0L, "")))
  }

  test("knobs: word floor and kept floor are parameters") {
    val df = Seq((8L, "One two three.\nFour five six seven!")).toDF("doc_id", "text")
    val out = C4Filter.c4LineFilter(df, minLineWords = 3, minKeptLines = 2)
      .selectExpr("n_kept", "pass").as[(Long, Long)].head()
    assert(out == ((2L, 1L)))
  }
}
