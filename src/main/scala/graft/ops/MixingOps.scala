package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data mixing: per-group sampling weights (down- AND
  * up-sampling) applied as a pure hash threshold per row — the way
  * training-corpus mixes are reproducibly materialized at scale
  * (per-source/per-language weights as in C4/ROOTS/RefinedWeb mixes).
  *
  * Why hash sampling and not `df.sample`: `sample(fraction, seed)` draws
  * from a per-partition RNG stream, so its row set changes with
  * partitioning, cluster size, and task retries. The hash threshold
  * depends only on the row's own key — the same corpus yields the same
  * mix on 1 executor or 1000, under AQE re-partitioning, and under task
  * retry (exactly-once sampling without exactly-once machinery). That
  * reproducibility is the property a 100-TB training-mix rebuild needs.
  *
  * Scale shape: one map-side projection — no shuffle, no RNG state, no
  * driver involvement; the weight table is a tiny literal CASE (broadcast
  * by value inside the plan). A weight w emits floor(w) full copies per
  * row plus one more with probability frac(w), decided by comparing the
  * first 8 hex chars of md5(key + "#frac") against the fixed-width hex
  * literal of frac(w)·2^32 — lowercase fixed-width hex compares
  * lexicographically exactly as the number, and DuckDB's md5 produces
  * the identical digest, so the whole op is oracle-replayable.
  */
object MixingOps {

  /** Fixed-width lowercase hex literal of floor(frac · 2^32): rows whose
    * md5-prefix is lexicographically below it are the frac-share. */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    f"${math.min((frac * 4294967296.0).toLong, 0xffffffffL)}%08x"
  }

  /** True for the `frac`-share of keys, by md5-prefix threshold. The
    * `salt` decorrelates independent sampling decisions on the same key. */
  def hashKeep(key: Column, frac: Double, salt: String = "#frac"): Column =
    if (frac >= 1) lit(true)
    else if (frac <= 0) lit(false)
    else substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) < lit(thresholdHex(frac))

  /** Rows replicated per-group weight: weight 2.6 on a row's group emits
    * copies 1..2 always and copy 3 for a deterministic 60% of keys;
    * weight 0.25 keeps 25% of rows (copy 1). Output = input columns +
    * `copy` (1-based). Weights must be ≥ 0; groups absent from `weights`
    * get `defaultWeight`. */
  def weightedMix(docs: DataFrame, groupCol: String, weights: Map[String, Double],
                  defaultWeight: Double, keyCol: String = "doc_id"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0), "weights must be >= 0")
    def perGroup(f: Double => Column): Column =
      weights.foldLeft(f(defaultWeight)) { case (acc, (g, w)) =>
        when(col(groupCol) === g, f(w)).otherwise(acc)
      }
    val whole = perGroup(w => lit(w.toLong))
    val extra = perGroup { w =>
      val frac = w - w.toLong
      hashKeep(col(keyCol), frac).cast("long")
    }
    val copies = (whole + extra).as("__copies")
    docs.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic global shuffle + shard assignment — the "randomize and
    * shard the corpus for training" step every LLM data pipeline ends
    * with. Each row gets:
    *   shard — md5-derived uniform bucket in [0, nShards)
    *   pos   — its 1-based position within the shard under the
    *           hash-random total order (md5 hex compares
    *           lexicographically exactly as the number it encodes)
    * The order depends only on (key, salt): the same corpus shuffles
    * identically on 1 executor or 1000, under AQE and task retry —
    * `orderBy(rand(seed))`'s per-partition RNG stream gives none of that
    * (same argument as `hashKeep` above). A different `salt` is a fresh
    * independent epoch-shuffle of the same corpus.
    *
    * Shard from the first 16 hash bits (not a 64-bit value) so an oracle
    * in any SQL engine can rebuild it from hex nibbles without bigint
    * hex-decode support; 65,536 >> any practical nShards keeps the
    * mod-bias negligible.
    *
    * Scale shape: the hash is a map-side projection; the only shuffle is
    * the per-shard ordering. The window form here is the semantic spec;
    * at 10^12 rows materialize the same thing with
    * `repartition(nShards, col("shard")).sortWithinPartitions("sort_key")`
    * and write per-shard files — identical order, no global window, and
    * shards are the write-side unit of parallelism. */
  def shardAssign(docs: DataFrame, nShards: Int, keyCol: String = "doc_id",
                  salt: String = "#shuffle"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(col(keyCol).cast("string"), lit(salt)))
    docs
      .withColumn("sort_key", h)
      .withColumn("shard",
        conv(substring(col("sort_key"), 1, 4), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("sort_key"), col(keyCol)))
        .cast("long"))
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /** The write-path materialization of `shardAssign` — what actually runs
    * at 10^12 rows: repartition BY shard (each shard lands wholly in one
    * task), sort within the partition by the same hash order, and stream
    * shard files out — rows leave the writer already in shuffle order
    * with NO global window and no `pos` column to carry (a row's position
    * is its offset in its shard file). One shuffle, same as the window
    * form, but the per-shard sort is a streaming spill-friendly task sort
    * instead of a windowed rank. MixingOpsSpec asserts the written order
    * is byte-identical to `shardAssign`'s `pos` order per shard. */
  def writeShards(docs: DataFrame, nShards: Int, path: String,
                  keyCol: String = "doc_id", salt: String = "#shuffle"): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = md5(concat(col(keyCol).cast("string"), lit(salt)))
    docs
      .withColumn("sort_key", h)
      .withColumn("shard",
        conv(substring(col("sort_key"), 1, 4), 16, 10).cast("long") % nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(keyCol))
      .drop("sort_key")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }
}
