package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Token-counting semantics (whitespace + the BPE-ish pre-tokenizer). */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(text: String): (Int, Int) = {
    val r = Seq(text).toDF("text")
      .select(TextStats.tokenCount(col("text")).as("ws"),
        TextStats.bpeTokenCount(col("text")).as("bpe"))
      .head()
    (r.getInt(0), r.getInt(1))
  }

  test("whitespace count ignores empty tokens from runs of spaces") {
    assert(counts("a  b   c") == (3, 3))
    assert(counts("") ==(0, 0))
    assert(counts("   ") == (0, 0))
  }

  test("BPE-ish segmentation splits contractions, digits, punctuation") {
    // it's -> [it]['s]; doc-42 -> [doc][-][42]; #tag -> [#][tag]
    assert(counts("it's")._2 == 2)
    assert(counts("doc-42")._2 == 3)
    assert(counts("#tag")._2 == 2)
    // space-prefixed runs stay one segment each
    assert(counts("hello world")._2 == 2)
    // mixed: "we've 2 cats!" -> [we]['ve][ 2][ cats][!]
    assert(counts("we've 2 cats!")._2 == 5)
  }

  test("BPE count >= whitespace count on any text (segments only split)") {
    val texts = Seq("plain words only", "x9y", "a'b'c", "n0 m1x3d t3xt!",
      "trailing space ", " leading")
    texts.foreach { t =>
      val (ws, bpe) = counts(t)
      assert(bpe >= ws, s"'$t' ws=$ws bpe=$bpe")
    }
  }

  test("rare-token stats: hapax detection, permille, threshold, empty doc") {
    import spark.implicits._
    // corpus frequencies: 'a' x4, 'b' x2, 'x'/'y'/'z' x1 each
    val docs = Seq(
      (1L, "a a b x"),   // 1 hapax of 4 tokens -> 250 permille
      (2L, "a b y z"),   // 2 hapax of 4 -> 500
      (3L, "a a"),       // 0 hapax
      (4L, "")           // empty: 0 tokens, 0 permille
    ).toDF("doc_id", "text")
    val got = TextStats.rareTokenStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 1L, 250L)))
    assert(got(2L) == ((4L, 2L, 500L)))
    assert(got(3L) == ((2L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L)))
    // raising the threshold to 2 makes 'b' (corpus count 2) rare too
    val got2 = TextStats.rareTokenStats(docs, rareMaxCount = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2(1L) == 2L && got2(2L) == 3L && got2(3L) == 0L)
  }

  test("qualityBuckets: equal-depth per language, score-monotone buckets") {
    import spark.implicits._
    // en: 9 docs with distinct-permille 100..900 (10 tokens, 1..9 distinct);
    // de: 3 docs so each tercile gets exactly one
    def text(distinct: Int): String =
      ((0 until distinct).map(i => s"w$i") ++ Seq.fill(10 - distinct)("w0")).mkString(" ")
    val docs = ((1 to 9).map(i => (i.toLong, "en", text(i))) ++
      (10 to 12).map(i => (i.toLong, "de", text(i - 9))))
      .toDF("doc_id", "lang", "text")
    val got = TextStats.qualityBuckets(docs, buckets = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val en = got.filter(_._2 == "en")
    // equal depth: 3 docs per bucket
    assert(en.groupBy(_._4).view.mapValues(_.length).toMap == Map(1L -> 3, 2L -> 3, 3L -> 3))
    // bucket 1 = head (highest scores): docs 7,8,9
    assert(en.filter(_._4 == 1L).map(_._1).toSet == Set(7L, 8L, 9L))
    assert(en.filter(_._4 == 3L).map(_._1).toSet == Set(1L, 2L, 3L))
    // languages bucket independently: de's 3 docs land one per bucket
    val de = got.filter(_._2 == "de")
    assert(de.map(_._4).toSet == Set(1L, 2L, 3L))
    assert(de.maxBy(_._3)._4 == 1L)
  }

  test("qualityBucketsSketch: monotone cut-point buckets, near-equal depth, ties co-bucketed") {
    import spark.implicits._
    def text(distinct: Int): String =
      ((0 until distinct).map(i => s"w$i") ++ Seq.fill(10 - distinct)("w0")).mkString(" ")
    // tie-free: 9 distinct scores in one language
    val docs = (1 to 9).map(i => (i.toLong, "en", text(i))).toDF("doc_id", "lang", "text")
    val got = TextStats.qualityBucketsSketch(docs, buckets = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length == 9)
    // monotone: a higher score never lands in a later (worse) bucket
    got.foreach { a => got.foreach { b =>
      if (a._2 > b._2) assert(a._3 <= b._3, s"$a vs $b") } }
    // near-equal depth on tie-free data: every bucket within ±1 of n/3
    val depths = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(depths.keySet == Set(1L, 2L, 3L))
    assert(depths.values.forall(d => d >= 2 && d <= 4), depths.toString)
    // ties land in ONE bucket (the contract ntile cannot give): all-equal
    // scores collapse into a single bucket
    val tied = (1 to 9).map(i => (i.toLong, "en", text(5))).toDF("doc_id", "lang", "text")
    val tiedBuckets = TextStats.qualityBucketsSketch(tied, buckets = 3).collect()
      .map(_.getLong(3)).toSet
    assert(tiedBuckets.size == 1, tiedBuckets.toString)
  }
}
