package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.io.{DeltaLog, TableIO}
import graft.pipeline.{DedupConfig, DedupPipeline, DedupStages, IncrementalDedup}

/**
 * Structured-Streaming front end for the dedup pipeline. The reference is
 * a batch system with incremental watermarks (SURVEY.md §2.9): harvested
 * record batches update the record store, dirty records are re-deduped,
 * merged output is re-indexed. Here each micro-batch of pages rows is an
 * UPSERT set (url = key, latest wins); `foreachBatch` folds it into the
 * persisted state via the incremental pass.
 *
 * State I/O is O(batch) per micro-batch, not O(corpus) (the reference
 * writes only dirty records back, classes/RecordManager.php:1988-1994):
 * the four state tables — pages, signatures, probes, verified_pairs —
 * are APPEND-ONLY delta logs (graft.io.DeltaLog); each batch appends only
 * its upserts / dirty-doc signatures / dirty-doc probes / newly-verified
 * pairs, all batch-stamped. Readers resolve:
 *
 *   pages, signatures  — latest `_batch` per url wins
 *   probes             — a probe row is live iff its `_batch` equals its
 *                        doc's latest signature batch (stale probes of a
 *                        re-signed url die without tombstones)
 *   verified_pairs     — an emission at batch b is live iff NEITHER
 *                        endpoint was re-signed after b (the carried-pair
 *                        rule of IncrementalDedup, evaluated at read);
 *                        duplicate emissions keep the latest
 *
 * Every `compactEvery` batches the resolved views are rewritten as a
 * single delta (original `_batch` stamps preserved — liveness depends on
 * them), so reads stay O(corpus + compactEvery · batch) and the
 * amortized write cost per batch is O(batch + corpus/compactEvery).
 *
 * Outputs per batch — clusters, merged_clusters — are full TableIO
 * commits: they are derived tables bounded by the duplicate population
 * (≪ corpus), and downstream consumers read them whole.
 *
 * `Trigger.AvailableNow` reproduces the reference's
 * run-to-watermark-and-stop semantics; a continuous trigger gives rolling
 * dedup. The stream checkpoint makes redelivery at-least-once, and both
 * the delta append (keyed by batchId) and the output commit are
 * idempotent, so the effect is exactly-once — the reference's
 * watermark-overlap argument (classes/SolrUpdater.php:292-302).
 */
object StreamingDedup {

  private val pageCols = Seq("url", "warc_ts", "html", "text", "lang", "source")

  /** Latest-batch-wins resolution per url. */
  private def latestPerUrl(df: DataFrame): DataFrame =
    df.withColumn("_rnk", row_number().over(
        Window.partitionBy("url").orderBy(col("_batch").desc)))
      .where(col("_rnk") === 1).drop("_rnk")

  /** Raw delta union, optionally restricted to rows stamped BEFORE a
    * batch — the redelivery guard: a re-run of batch b must build its
    * prev-state views as if b's own (possibly partial) appends never
    * happened, or a crash between two appends would make the re-run see
    * its dirty docs as already-signed and silently skip their pairs. */
  private def rawRead(spark: SparkSession, stateDir: String, table: String,
                      before: Option[Long]): Option[DataFrame] =
    DeltaLog.read(spark, stateDir, table)
      .map(df => before.fold(df)(b => df.where(col("_batch") < b)))

  /** Resolved pages snapshot (None before the first batch). */
  def resolvedPages(spark: SparkSession, stateDir: String,
                    before: Option[Long] = None): Option[DataFrame] =
    rawRead(spark, stateDir, "pages", before)
      .map(d => latestPerUrl(d).drop("_batch"))

  /** Resolved signature view WITH the `_batch` stamp (callers needing the
    * lean schema drop it). */
  private def resolvedSigsStamped(spark: SparkSession, stateDir: String,
                                  before: Option[Long]): Option[DataFrame] =
    rawRead(spark, stateDir, "signatures", before).map(latestPerUrl)

  def resolvedSignatures(spark: SparkSession, stateDir: String,
                         before: Option[Long] = None): Option[DataFrame] =
    resolvedSigsStamped(spark, stateDir, before).map(_.drop("_batch"))

  /** Live probes: `_batch` must match the doc's latest signature batch. */
  def resolvedProbes(spark: SparkSession, stateDir: String,
                     before: Option[Long] = None): Option[DataFrame] =
    for {
      probes <- rawRead(spark, stateDir, "probes", before)
      sigs <- resolvedSigsStamped(spark, stateDir, before)
    } yield probes.join(
        sigs.select(col("doc_id"), col("_batch").as("_sig_batch")),
        Seq("doc_id"), "inner")
      .where(col("_batch") === col("_sig_batch"))
      .select("channel", "bucket_key", "doc_id", "tag")

  /** Live verified pairs: neither endpoint re-signed after the emission;
    * duplicate emissions of a pair keep the latest. */
  def resolvedVerified(spark: SparkSession, stateDir: String,
                       before: Option[Long] = None): Option[DataFrame] =
    for {
      ver <- rawRead(spark, stateDir, "verified_pairs", before)
      sigs <- resolvedSigsStamped(spark, stateDir, before)
    } yield {
      val sb = sigs.select(col("url"), col("_batch").as("_sb"))
      val live = ver
        .join(sb.select(col("url").as("url_a"), col("_sb").as("_sba")), Seq("url_a"))
        .join(sb.select(col("url").as("url_b"), col("_sb").as("_sbb")), Seq("url_b"))
        .where(col("_batch") >= col("_sba") && col("_batch") >= col("_sbb"))
      live.withColumn("_rnk", row_number().over(
          Window.partitionBy("url_a", "url_b").orderBy(col("_batch").desc)))
        .where(col("_rnk") === 1)
        .drop("_rnk", "_batch", "_sba", "_sbb")
    }

  /** Fold one upsert batch into the persisted state; returns the new
    * pipeline result (clusters/merged also committed to the state dir). */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   cfg: DedupConfig = DedupConfig(), batchId: Long = -1L,
                   compactEvery: Int = 8): DedupPipeline.Result = {
    val b = DedupStages.withSource(batch)
      // latest row per url within the batch (by warc_ts)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("url").orderBy(col("warc_ts").desc)))
      .where(col("_rn") === 1).drop("_rn")
      .select(pageCols.map(col): _*)

    val bid = if (batchId >= 0) batchId else DeltaLog.nextBatchId(stateDir, "pages")
    // data-level cold-start test (manifest batch ids are rewritten by
    // compaction; row stamps are not)
    val before = Some(bid)
    val havePrev = resolvedPages(spark, stateDir, before).exists(!_.isEmpty)

    // pages delta first: the resolved view then IS the new snapshot
    DeltaLog.append(b, stateDir, "pages", bid)
    val snapshot = resolvedPages(spark, stateDir).get

    val result =
      if (!havePrev) {
        // cold start: the whole batch is the delta
        val r = DedupPipeline.run(spark, snapshot, cfg)
        DeltaLog.append(r.signatures, stateDir, "signatures", bid)
        DeltaLog.append(r.probes, stateDir, "probes", bid)
        DeltaLog.append(r.verifiedPairs, stateDir, "verified_pairs", bid)
        r
      } else {
        val prev = IncrementalDedup.PrevState(
          resolvedSignatures(spark, stateDir, before).get,
          resolvedProbes(spark, stateDir, before).get,
          resolvedVerified(spark, stateDir, before).get)
        val d = IncrementalDedup.runDelta(spark, prev, snapshot, cfg)
        // O(dirty) state writes: ONLY this pass's increments are appended
        DeltaLog.append(d.deltaSignatures, stateDir, "signatures", bid)
        DeltaLog.append(d.deltaProbes, stateDir, "probes", bid)
        DeltaLog.append(d.deltaVerified, stateDir, "verified_pairs", bid)
        d.full
      }

    // derived outputs: full commits, bounded by the duplicate population
    val fp = s"batch-$bid"
    val ch = cfg.configHash
    val mer = TableIO.commit(result.merged, stateDir, "merged_clusters", ch, fp)
    val clu = TableIO.commit(result.clusters, stateDir, "clusters", ch, fp)

    // LSM-style compaction keeps the delta count bounded
    if (compactEvery > 0 && DeltaLog.list(stateDir, "pages").size > compactEvery) {
      DeltaLog.compact(spark, stateDir, "pages",
        latestPerUrl(DeltaLog.read(spark, stateDir, "pages").get), bid)
      val sigsStamped = resolvedSigsStamped(spark, stateDir, None).get
        .localCheckpoint(true) // pin: consumed by probes + verified liveness
      DeltaLog.compact(spark, stateDir, "signatures", sigsStamped, bid)
      val probes = DeltaLog.read(spark, stateDir, "probes").get
        .join(sigsStamped.select(col("doc_id"), col("_batch").as("_sig_batch")),
          Seq("doc_id"))
        .where(col("_batch") === col("_sig_batch")).drop("_sig_batch")
      DeltaLog.compact(spark, stateDir, "probes", probes, bid)
      val sb = sigsStamped.select(col("url"), col("_batch").as("_sb"))
      val ver = DeltaLog.read(spark, stateDir, "verified_pairs").get
        .join(sb.select(col("url").as("url_a"), col("_sb").as("_sba")), Seq("url_a"))
        .join(sb.select(col("url").as("url_b"), col("_sb").as("_sbb")), Seq("url_b"))
        .where(col("_batch") >= col("_sba") && col("_batch") >= col("_sbb"))
        .withColumn("_rnk", row_number().over(
          Window.partitionBy("url_a", "url_b").orderBy(col("_batch").desc)))
        .where(col("_rnk") === 1).drop("_rnk", "_sba", "_sbb")
      DeltaLog.compact(spark, stateDir, "verified_pairs", ver, bid)
      sigsStamped.unpersist()
    }

    DedupPipeline.Result(
      resolvedSignatures(spark, stateDir).get,
      resolvedProbes(spark, stateDir).get,
      result.candidatePairs, result.droppedBuckets,
      resolvedVerified(spark, stateDir).get, clu, mer)
  }

  /** Attach to a streaming pages DataFrame (readStream source of the same
    * shape); every micro-batch is folded into `stateDir`. */
  def attach(pagesStream: DataFrame, stateDir: String,
             cfg: DedupConfig = DedupConfig(),
             trigger: Trigger = Trigger.AvailableNow(),
             compactEvery: Int = 8): StreamingQuery =
    pagesStream.writeStream
      .outputMode("update")
      .trigger(trigger)
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, cfg, batchId,
          compactEvery): Unit
      }
      .start()
}
