package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Decontamination contract: n-gram hashing edges, and `overlap` against
  * an independent naive Scala oracle on a planted-overlap corpus. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(Decontaminate.ngramHashes(col("text"), n))
      .head().getSeq[String](0)

  /** Naive oracle: distinct shared n-grams as plain Scala sets. */
  private def naiveGrams(text: String, n: Int): Set[String] =
    text.split(" ").filter(_.nonEmpty).sliding(n)
      .filter(_.length == n).map(_.mkString(" ")).toSet

  test("ngramHashes: count, dedup, short-text edges") {
    // 6 tokens, n=3 -> 4 windows, all distinct
    assert(grams("a b c d e f", 3).length == 4)
    // repeated window dedups: "x y x y x" has 3 bigram windows, 2 distinct
    assert(grams("x y x y x", 2).length == 2)
    // fewer tokens than n -> empty, not null and not a [1,0] sequence
    assert(grams("a b", 3).isEmpty)
    assert(grams("", 3).isEmpty)
    // double spaces drop empties before windowing
    assert(grams("a  b   c", 3).length == 1)
    // hash is md5 hex of the space-joined window
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(grams("a b c", 3) == Seq(expected))
  }

  test("overlap matches a naive oracle and keeps clean docs at 0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no shared windows at all"),
      (3L, "prefix words then quick brown fox jumps over the lazy dog too"),
      (4L, "short doc"),
      (5L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val evalTexts = Seq(
      "quick brown fox jumps over the lazy dog",
      "another benchmark snippet that matches nothing in the corpus here"
    ).toDF("text")
    val n = 4
    val evalSet = Seq(
      "quick brown fox jumps over the lazy dog",
      "another benchmark snippet that matches nothing in the corpus here")
      .flatMap(naiveGrams(_, n)).toSet

    val got = Decontaminate.overlap(corpus, evalTexts, n = n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val want = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "completely unrelated text with no shared windows at all",
      3L -> "prefix words then quick brown fox jumps over the lazy dog too",
      4L -> "short doc",
      5L -> "the quick brown fox jumps over the lazy dog today"
    ).map { case (id, t) =>
      val hits = (naiveGrams(t, n) & evalSet).size.toLong
      id -> ((hits, hits >= 1L))
    }.toMap
    assert(got == want)
    assert(got(2L)._1 == 0L && !got(2L)._2) // clean doc present with 0
    assert(got(4L)._1 == 0L)                // sub-n doc present with 0
    assert(got(1L)._1 > 0L && got(3L)._1 > 0L && got(5L)._1 > 0L)
  }

  test("minHits threshold gates the contaminated bit, not the counts") {
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val evalTexts = Seq("one two three four five six").toDF("text")
    val strict = Decontaminate.overlap(corpus, evalTexts, n = 3, minHits = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // doc 1 shares all 4 windows; doc 2 shares only "one two three"
    assert(strict(1L) == ((4L, true)))
    assert(strict(2L) == ((1L, false)))
  }
}
