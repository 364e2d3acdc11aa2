package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Embedding near-dup channel: planted high-cosine pairs are found by the
  * SRP-bucket join + cosine verifier; knnBrute ranks an exact copy first. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    def jitter(eps: Float) = base.map(x => x + (rnd.nextFloat() * 2 - 1) * eps)
    (Seq(
      0L -> base,                 // anchor
      1L -> base.clone(),         // exact copy  -> cosine 1
      2L -> jitter(0.02f),        // near-dup    -> cosine ~0.999
      3L -> jitter(2.0f)          // far
    ) ++ (4L until 50L).map(i => i -> Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("cosineDupPairs finds planted high-cosine pairs, excludes the far ones") {
    val got = Similarity.cosineDupPairs(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    assert(got.contains((0L, 2L)))
    assert(got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("knnBrute: the exact copy is rank 1 for the anchor") {
    val got = Similarity.knnBrute(emb, nQueries = 1, k = 3)
      .where(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").head().getLong(0)
    assert(got == 1L)
  }
}
