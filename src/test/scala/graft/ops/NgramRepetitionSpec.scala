package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Gopher n-gram repetition stats vs an independent O(L·n) brute force
  * (hash-map counts — structurally unlike the operator's sorted-array
  * fold). */
class NgramRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute force: (top_permille, dup_permille) for n-grams of `text`. */
  private def brute(text: String, n: Int): (Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return (0L, 0L)
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
    val tot = grams.map(_.length.toLong).sum
    val dup = grams.filter(g => counts(g) >= 2).map(_.length.toLong).sum
    // most frequent gram, ties to the lexicographically smallest
    val (bg, bc) = counts.toSeq.minBy { case (g, c) => (-c, g) }
    val best = bc.toLong * bg.length
    (math.floor(1000.0 * best / tot).toLong,
      math.floor(1000.0 * dup / tot).toLong)
  }

  private val fixtures = Seq(
    1L -> "the cat sat on the mat the cat sat on the mat",
    2L -> "x y x y x y x y",
    3L -> "all distinct words here with no repeats at any position",
    4L -> "a b", // shorter than n=5: that column must read 0
    5L -> "", // empty doc: all zeros
    6L -> "tie tie breaker breaker zz", // 2-gram count tie -> lexicographic
    7L -> ("lorem ipsum dolor sit amet " * 4).trim,
    8L -> "one two three one two three one two four")

  test("matches brute force on repetition-shaped fixtures (n=2 and n=5)") {
    val df = fixtures.toDF("doc_id", "text")
    val got = TextStats.ngramRepetition(df)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    fixtures.foreach { case (id, text) =>
      val (t2, d2) = brute(text, 2)
      val (t5, d5) = brute(text, 5)
      assert(got(id) == ((t2, d2, t5, d5)), s"doc $id: '$text'")
    }
  }

  test("pure repetition saturates; distinct text zeroes the dup share") {
    val df = Seq((1L, "x y x y x y x y"), (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val m = TextStats.ngramRepetition(df)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // every 2-gram of "x y x y…" is a duplicate ("x y" or "y x")
    assert(m(1L)._2 == 1000L)
    assert(m(2L)._2 == 0L)
  }
}
