package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Gopher-gate semantics vs an independent in-Scala brute force (same
  * integer cross-multiplication rules, computed with plain collections). */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(text: String, minWords: Long = 50,
                    maxWords: Long = 100000): (Long, Long, Long, String) = {
    val words = text.replace('\n', ' ').split(" ", -1).filter(_.nonEmpty)
    // space-only trim: the contract matches Spark's and DuckDB's trim()
    // (ASCII 0x20 only), NOT java.lang.String#trim (all ctrl chars)
    val lines = text.split("\n", -1)
      .map(_.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse)
      .filter(_.nonEmpty)
    val n = words.length.toLong
    val nl = lines.length.toLong
    val sumLen = words.map(_.length.toLong).sum
    val hashes = text.count(_ == '#').toLong
    def nonOverlapping(s: String, sub: String): Long = {
      var i = 0; var c = 0L
      while ({ i = s.indexOf(sub, i); i >= 0 }) { c += 1; i += sub.length }
      c
    }
    val ells = nonOverlapping(text, "...") + text.count(_ == '…')
    val bullets = lines.count(l => l.startsWith("- ") || l.startsWith("* ")
      || l.startsWith("• ")).toLong
    val ellLines = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
    val alpha = words.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val stops = words.filter(TextStats.gateStopwords.contains).distinct.length.toLong
    val failed = Seq(
      "alpha_words" -> (alpha * 5 >= n * 4),
      "bullet_lines" -> (bullets * 10 <= nl * 9),
      "ellipsis_lines" -> (ellLines * 10 <= nl * 3),
      "mean_word_len" -> (sumLen >= n * 3 && sumLen <= n * 10),
      "stopwords" -> (stops >= 2),
      "symbol_ratio" -> ((hashes + ells) * 10 <= n),
      "word_count" -> (n >= minWords && n <= maxWords)
    ).collect { case (tag, ok) if !ok => tag }
    (n, nl, if (failed.isEmpty) 1L else 0L, failed.mkString(","))
  }

  private val passing: String = // 56 words, 8 lines, stopwords present
    (1 to 8).map(i => s"the quick brown fox and lazy dog number $i jumped over again"
      .split(" ").take(7).mkString(" ")).mkString("\n") +
      "\nthe end of that tale have with more words here now so the count clears fifty total " +
      "plus some extra filler words to be safe and sound indeed"

  private val fixtures = Seq(
    "plain-pass" -> passing,
    "bullets" -> "- alpha beta\n- gamma delta\n- epsilon zeta\n- eta theta\n- iota kappa",
    "ellipsis" -> "we have the words to be sure...\nand that is of course more...\nwith more to come...",
    "symbols" -> (passing + " # # # # # # # # # # # # # # # # # # # #"),
    "unicode-ellipsis" -> (passing + "\nto be continued…"),
    "numeric-words" -> ("1 22 333 4444 55555 " * 12).trim,
    "short-words" -> ("aa bb cc " * 20).trim,
    "empty" -> "",
    "whitespace-lines" -> "   \n  \n\t")

  test("qualityGate matches the brute force on all fixtures") {
    val df = fixtures.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val got = TextStats.qualityGate(df)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for ((id, t) <- fixtures)
      assert(got(id) == brute(t), s"fixture $id")
  }

  test("fixtures exercise every rule at least once") {
    val reasons = fixtures.flatMap { case (_, t) => brute(t)._4.split(",") }
      .filter(_.nonEmpty).toSet
    assert(Set("alpha_words", "bullet_lines", "ellipsis_lines", "mean_word_len",
      "stopwords", "symbol_ratio", "word_count").subsetOf(reasons), reasons.toString)
    // and at least one doc passes outright
    assert(fixtures.exists { case (_, t) => brute(t)._3 == 1L })
  }

  test("word-count bounds are configurable") {
    val df = Seq(("a", passing)).toDF("doc_id", "text")
    val tight = TextStats.qualityGate(df, maxWords = 10)
      .as[(String, Long, Long, Long, String)].head()
    assert(tight._4 == 0L && tight._5.contains("word_count"))
  }
}
