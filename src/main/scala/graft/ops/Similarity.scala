package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`):
 * brute-force cosine top-k as the exact baseline, and a random-hyperplane
 * LSH-bucketed variant as the scale path (bucket join instead of full
 * cross product — the same blocking idea the dedup pipeline uses for
 * text, SURVEY.md §7.0).
 */
object Similarity {

  /** Deterministic hyperplanes: nBits × dim signed coefficients from
    * splitmix64 (no wall-clock randomness, fixed seed). */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var st = seed
    Array.fill(nBits) {
      Array.fill(dim) {
        val (s1, v) = graft.functions.SignatureCoefficients.splitmix64(st)
        st = s1
        // map to [-1, 1)
        v.toDouble / Long.MaxValue.toDouble
      }
    }
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k cosine neighbors of each query vector (query set =
    * vec_id < nQueries) against the full table. The small query side is
    * BROADCAST, so the big side is scanned exactly once with no shuffle —
    * the plan that survives a 100× scale-up of the corpus side. */
  def knnBrute(emb: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Sign-random-projection bucket code (nBits-bit int) per vector. */
  def srpBucket(emb: DataFrame, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(nBits, dim, seed)
    val v = asDouble(col("embedding"))
    val bits = (0 until nBits).map { b =>
      val plane = array(planes(b).map(lit): _*)
      when(dot(v, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    emb.select(col("vec_id"), v.as("v"),
      bits.reduce(_ + _).as("bucket"))
  }

  /** Embedding near-duplicate pairs: SRP bucket join as the candidate
    * generator (same blocking pattern as the text LSH channel), exact
    * cosine >= threshold as the verifier. Canonical (id_a < id_b). */
  def cosineDupPairs(emb: DataFrame, threshold: Double, nBits: Int = 8,
                     seed: Long = 42L): DataFrame = {
    val coded = srpBucket(emb, nBits, seed)
    val a = coded.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = coded.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, "bucket")
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** ANN: exact rerank within SRP buckets only — candidate generation is
    * a bucket equi-join (shuffle on a small key) instead of a cross join.
    * Approximate by construction; recall grows with fewer bits / multi-probe. */
  def knnLsh(emb: DataFrame, nQueries: Int = 20, k: Int = 5,
             nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val coded = srpBucket(emb, nBits, seed)
    val queries = coded.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val scored = coded.join(queries, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }
}
