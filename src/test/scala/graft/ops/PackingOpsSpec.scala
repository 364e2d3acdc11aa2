package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** PackingOps contract vs a naive Scala cumsum oracle, plus boundary
  * straddling, empty docs, and partition-independence. */
class PackingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def got(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  /** Naive single-bucket oracle: (n_tokens, pack_first, pack_last, offset). */
  private def naive(texts: Seq[String], budget: Int): Map[Long, (Long, Long, Long, Long)] = {
    var cum = 0L
    texts.zipWithIndex.map { case (t, i) =>
      val n = t.split(" ").count(_.nonEmpty).toLong
      val start = cum; cum += n
      val last = if (n > 0) (cum - 1) / budget else start / budget
      i.toLong -> ((n, start / budget, last, start % budget))
    }.toMap
  }

  test("single bucket matches the naive cumsum oracle, incl. straddlers and empties") {
    // budget 5: doc0 (3 tok) pack 0; doc1 (4 tok) straddles packs 0-1 at
    // offset 3; doc2 empty sits at its start point; doc3 (6 tok) spans 1-2
    val texts = Seq("a b c", "d e f g", "", "h i j k l m")
    val out = got(PackingOps.packSequences(mk(texts), budgetTokens = 5, buckets = 1))
    assert(out == naive(texts, 5))
    assert(out(1L) == ((4L, 0L, 1L, 3L))) // the straddler, explicitly
    assert(out(2L) == ((0L, 1L, 1L, 2L))) // empty doc: first == last
  }

  test("bucketed packing is per-bucket independent and deterministic under repartition") {
    val texts = (0 until 60).map(i => ("w " * (i % 7 + 1)).trim)
    val a = got(PackingOps.packSequences(mk(texts), 10, buckets = 4))
    val b = got(PackingOps.packSequences(mk(texts).repartition(13), 10, buckets = 4))
    assert(a == b)
    // each bucket's stream starts at pack 0, offset 0 for its first doc
    (0 until 4).foreach { bk =>
      assert(a(bk.toLong)._2 == 0L && a(bk.toLong)._4 == 0L)
    }
    // no doc skips a pack: last - first <= ceil(n/budget)
    a.values.foreach { case (n, first, last, _) => assert(last - first <= n / 10 + 1) }
  }
}
