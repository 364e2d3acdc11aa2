package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/**
 * Per-stage + per-partition lineage/metrics rows — the Spark analog of the
 * reference's throughput counter (classes/PerformanceCounter.php:40-97)
 * and the north rule's "every stage writes per-partition lineage and
 * metrics" requirement.
 *
 * For every committed pipeline stage the table carries:
 *   - one row per output partition: (stage, partition_id, rows, ...)
 *     — partition-level row distribution makes skew visible from the
 *     metrics table alone on a 1000-executor run
 *   - one stage-total row with partition_id = -1
 *   - wall_ms (0 for stages reused from checkpoint — resume lineage)
 *   - snapshot_id = the (configHash, inputFingerprint) identity the stage
 *     was committed under, tying each metric row to its exact lineage
 *
 * Reading back the COMMITTED parquet (not the in-flight plan) means the
 * counts are the durable truth a resumed run would see.
 */
object Metrics {

  def stageMetrics(spark: SparkSession, root: String,
                   timings: Seq[(String, Long)], snapshotId: String): DataFrame =
    timings.map { case (stage, wallMs) =>
      val df = TableIO.read(spark, root, stage)
      val parts = df
        .groupBy(F.spark_partition_id().cast("long").as("partition_id"))
        .agg(F.count(F.lit(1)).as("rows"))
      val total = parts
        .agg(F.coalesce(F.sum("rows"), F.lit(0L)).as("rows"))
        .select(F.lit(-1L).as("partition_id"), F.col("rows"))
      parts.select("partition_id", "rows").unionByName(total)
        .select(F.lit(stage).as("stage"), F.col("partition_id"), F.col("rows"),
          F.lit(wallMs).as("wall_ms"), F.lit(snapshotId).as("snapshot_id"))
    }.reduce(_ unionByName _)
}
