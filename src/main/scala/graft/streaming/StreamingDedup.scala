package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.io.TableIO
import graft.pipeline.{DedupConfig, DedupPipeline, DedupStages, IncrementalDedup}

/**
 * Structured-Streaming front end for the dedup pipeline. The reference is
 * a batch system with incremental watermarks (SURVEY.md §2.9): harvested
 * record batches update the record store, dirty records are re-deduped,
 * merged output is re-indexed. Here each micro-batch of pages rows is an
 * UPSERT set (url = key, latest wins); `foreachBatch` folds it into the
 * persisted state via the incremental pass:
 *
 *   state tables (TableIO dir): pages, signatures, verified_pairs
 *   outputs per batch: clusters, merged_clusters
 *
 * `Trigger.AvailableNow` reproduces the reference's
 * run-to-watermark-and-stop semantics; a continuous trigger gives rolling
 * dedup. The stream checkpoint makes redelivery at-least-once, and the
 * batch fold is idempotent (same upserts → same state), so the effect is
 * exactly-once — the reference's watermark-overlap argument
 * (classes/SolrUpdater.php:292-302).
 */
object StreamingDedup {

  private val pageCols = Seq("url", "warc_ts", "html", "text", "lang", "source")

  /** Fold one upsert batch into the persisted state; returns the new
    * pipeline result (also written to the state dir). */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   cfg: DedupConfig = DedupConfig()): DedupPipeline.Result = {
    val b = DedupStages.withSource(batch)
      // latest row per url within the batch (by warc_ts)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("url")
          .orderBy(col("warc_ts").desc)))
      .where(col("_rn") === 1).drop("_rn")
      .select(pageCols.map(col): _*)

    val havePrev = TableIO.readManifest(stateDir, "pages").isDefined
    val snapshot =
      if (!havePrev) b
      else {
        val old = TableIO.read(spark, stateDir, "pages")
        b.unionByName(old.join(b.select("url"), Seq("url"), "left_anti")
          .select(pageCols.map(col): _*))
      }

    val result =
      if (!havePrev) DedupPipeline.run(spark, snapshot, cfg)
      else {
        val prev = IncrementalDedup.PrevState(
          TableIO.read(spark, stateDir, "signatures"),
          TableIO.read(spark, stateDir, "probes"),
          TableIO.read(spark, stateDir, "verified_pairs"))
        IncrementalDedup.run(spark, prev, snapshot, cfg)
      }

    // persist the fold (batch-stamped fingerprints: each commit replaces
    // the previous state atomically). Commit order matters: every result
    // here is a LAZY plan over the previous state directories, so
    // downstream outputs commit first and the directories they read
    // (signatures, pages) are swapped last.
    val fp = DedupPipeline.inputFingerprint(snapshot)
    val ch = cfg.configHash
    val mer = TableIO.commit(result.merged, stateDir, "merged_clusters", ch, fp)
    val clu = TableIO.commit(result.clusters, stateDir, "clusters", ch, fp)
    val ver = TableIO.commit(result.verifiedPairs, stateDir, "verified_pairs", ch, fp)
    val prb = TableIO.commit(result.probes, stateDir, "probes", ch, fp)
    val sigs = TableIO.commit(result.signatures, stateDir, "signatures", ch, fp)
    TableIO.commit(snapshot, stateDir, "pages", ch, fp)
    DedupPipeline.Result(sigs, prb, result.candidatePairs, result.droppedBuckets,
      ver, clu, mer)
  }

  /** Attach to a streaming pages DataFrame (readStream source of the same
    * shape); every micro-batch is folded into `stateDir`. */
  def attach(pagesStream: DataFrame, stateDir: String,
             cfg: DedupConfig = DedupConfig(),
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    pagesStream.writeStream
      .outputMode("update")
      .trigger(trigger)
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, cfg): Unit
      }
      .start()
}
