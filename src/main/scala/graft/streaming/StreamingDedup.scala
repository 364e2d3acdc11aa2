package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * persisted state with a bucket-pruned specialization of
 * IncrementalDedup.runDelta.
 *
 * State I/O is O(batch) per micro-batch for WRITES (the reference writes
 * only dirty records back, classes/RecordManager.php:1988-1994): the four
 * state tables — pages, signatures, probes, verified_pairs — are
 * APPEND-ONLY delta logs (graft.io.DeltaLog); each batch appends only its
 * upserts / dirty-doc signatures / dirty-doc probes / newly-verified
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
 * READS are bucket-pruned (the round-3 O(corpus)-per-batch read fixed):
 * pages and signatures deltas are directory-partitioned by
 * `_ub = pmod(xxhash64(url), stateBuckets)`, probes by
 * `_ub = pmod(xxhash64(channel, bucket_key), stateBuckets)`, and
 * verified_pairs by the MIN-endpoint url bucket
 * `_ub = pmod(xxhash64(url_a), stateBuckets)` (url_a is the canonical min
 * — stable across re-emissions), so each batch resolves latest-per-url
 * only in the url buckets it TOUCHES, reads stored probes only in the
 * LSH-bucket partitions its dirty docs probe, reads page text only in
 * the url buckets of verify participants and cluster members, and
 * bucket-scoped pair consumers prune to their partitions. The per-batch
 * carried-pair view does need the FULL live pair population (each batch
 * commits full cluster output), but its resolution never shuffles the
 * compacted pair baseline: liveness splits at the compaction watermark
 * (see resolvedVerified) into broadcast anti-joins for the baseline and
 * a full join+window only over the (small) post-compaction pair deltas.
 * What still scans the full log per batch is narrow and column-pruned:
 * the (url, _batch) since-watermark re-sign scan and the content-hash
 * column behind the exact channel — fixed-width columns of the lean
 * signature log, never text.
 *
 * Every `compactEvery` batches the resolved views are rewritten as a
 * single delta (original `_batch` stamps AND bucket layout preserved —
 * liveness and pruning both depend on them), so reads stay
 * O(touched-bucket state + corpus/compactEvery·narrow) and the amortized
 * write cost per batch is O(batch + corpus/compactEvery).
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

  /** Default url-hash bucket count for the partitioned state layout. At
    * 10¹² docs each of the 64 buckets holds ~1.6% of the state; a batch
    * touching k buckets reads k/64 of the page/signature logs. The value
    * must stay FIXED for the lifetime of a state dir (it defines the
    * directory layout). */
  val defaultStateBuckets = 64

  /** url bucket: pmod(xxhash64(url), nB) — equal to pmod(doc_id, nB)
    * because doc_id = xxhash64(url) (DedupStages.withIds), so a doc's
    * bucket is derivable from either column. */
  private def urlBucket(nB: Int): Column =
    pmod(xxhash64(col("url")), lit(nB.toLong)).cast("int")

  /** probe-partition bucket: over the LSH bucket key, NOT the doc — a
    * dirty doc's probes land in few LSH buckets, and those buckets'
    * partitions are exactly what the candidate join needs to read. */
  private def probeBucket(nB: Int): Column =
    pmod(xxhash64(col("channel"), col("bucket_key")), lit(nB.toLong)).cast("int")

  /** verified-pair bucket: the MIN endpoint's url bucket — url_a is the
    * canonical (lexicographic min) endpoint, stable across re-emissions
    * of a pair, so every emission lands in the same partition and
    * bucket-scoped readers prune soundly. */
  private def pairBucket(nB: Int): Column =
    pmod(xxhash64(col("url_a")), lit(nB.toLong)).cast("int")

  /** Latest-batch-wins resolution per url. */
  private def latestPerUrl(df: DataFrame): DataFrame =
    df.withColumn("_rnk", row_number().over(
        Window.partitionBy("url").orderBy(col("_batch").desc)))
      .where(col("_rnk") === 1).drop("_rnk")

  /** Raw delta union, optionally restricted to rows stamped BEFORE a
    * batch — the redelivery guard: a re-run of batch b must build its
    * prev-state views as if b's own (possibly partial) appends never
    * happened, or a crash between two appends would make the re-run see
    * its dirty docs as already-signed and silently skip their pairs —
    * and optionally restricted to a set of `_ub` partitions (parquet
    * directory pruning; `Some(Nil)` reads nothing). */
  private def rawRead(spark: SparkSession, stateDir: String, table: String,
                      before: Option[Long],
                      buckets: Option[Seq[Int]] = None): Option[DataFrame] =
    DeltaLog.read(spark, stateDir, table)
      .map(df => before.fold(df)(b => df.where(col("_batch") < b)))
      .map(df => buckets.fold(df)(bs => df.where(col("_ub").isin(bs: _*))))

  private def dropMeta(df: DataFrame): DataFrame =
    df.drop("_batch", "_ub")

  /** Resolved pages snapshot (None before the first batch). */
  def resolvedPages(spark: SparkSession, stateDir: String,
                    before: Option[Long] = None): Option[DataFrame] =
    rawRead(spark, stateDir, "pages", before)
      .map(d => dropMeta(latestPerUrl(d)))

  /** Resolved signature view WITH the `_batch` stamp (callers needing the
    * lean schema drop it). */
  private def resolvedSigsStamped(spark: SparkSession, stateDir: String,
                                  before: Option[Long]): Option[DataFrame] =
    rawRead(spark, stateDir, "signatures", before).map(d => latestPerUrl(d).drop("_ub"))

  def resolvedSignatures(spark: SparkSession, stateDir: String,
                         before: Option[Long] = None): Option[DataFrame] =
    resolvedSigsStamped(spark, stateDir, before).map(_.drop("_batch"))

  /** Narrow per-doc latest signature batch — the liveness clock. groupBy
    * max over the two fixed-width columns (column-pruned scan, map-side
    * partial agg); equivalent to the latest-per-url window because
    * doc_id = xxhash64(url) is 1:1 with url. */
  private def sigBatchByDoc(spark: SparkSession, stateDir: String,
                            before: Option[Long]): Option[DataFrame] =
    rawRead(spark, stateDir, "signatures", before)
      .map(_.select("doc_id", "_batch").groupBy("doc_id")
        .agg(max("_batch").as("_sig_batch")))

  /** Live probes: `_batch` must match the doc's latest signature batch. */
  def resolvedProbes(spark: SparkSession, stateDir: String,
                     before: Option[Long] = None,
                     buckets: Option[Seq[Int]] = None): Option[DataFrame] =
    for {
      probes <- rawRead(spark, stateDir, "probes", before, buckets)
      clock <- sigBatchByDoc(spark, stateDir, before)
    } yield probes.join(clock, Seq("doc_id"), "inner")
      .where(col("_batch") === col("_sig_batch"))
      .select("channel", "bucket_key", "doc_id", "tag")

  /** Live verified pairs: neither endpoint re-signed after the emission;
    * duplicate emissions of a pair keep the latest.
    *
    * Resolution is SPLIT at the compaction watermark `vc` (the pair log's
    * `c…` dir batch id) so the O(pair-population) compacted baseline is
    * never shuffled per batch:
    *
    *  - a compacted row was liveness-resolved and deduped against the
    *    whole log as of `vc`, so it is live NOW iff neither endpoint
    *    re-signed after `vc` and no later emission of the same pair
    *    exists — two broadcast anti-joins against the (small)
    *    since-watermark re-sign set and the (small) post-compaction pair
    *    keys: ONE scan of the baseline, zero shuffles of it
    *  - post-compaction (`d…`) rows — O(pairs touched since compaction) —
    *    pay the full liveness join + latest-per-pair window, but only
    *    against the since-watermark sig events
    *
    * The since-watermark re-sign set itself is a column-pruned
    * (url, _batch) scan of the signature log with the selective
    * `_batch > vc` predicate — no corpus-wide groupBy/window. A dead
    * later emission implies a since-watermark re-sign of an endpoint, so
    * anti-joining the baseline on ALL post-compaction pair keys (not just
    * live ones) cannot resurrect or lose a pair.
    *
    * `buckets` prunes both sides to the given min-endpoint url-hash `_ub`
    * partitions — sound for bucket-scoped consumers because every
    * emission of a pair carries the same `_ub` (url_a is the canonical
    * min endpoint, stable across re-emissions). */
  def resolvedVerified(spark: SparkSession, stateDir: String,
                       before: Option[Long] = None,
                       buckets: Option[Seq[Int]] = None): Option[DataFrame] = {
    def flt(df: DataFrame): DataFrame = {
      val b = before.fold(df)(x => df.where(col("_batch") < x))
      buckets.fold(b)(bs => b.where(col("_ub").isin(bs: _*)))
    }
    val comp = DeltaLog.readWhere(spark, stateDir, "verified_pairs",
      DeltaLog.isCompacted).map(flt)
    val delt = DeltaLog.readWhere(spark, stateDir, "verified_pairs",
      e => !DeltaLog.isCompacted(e)).map(flt)
    if (comp.isEmpty && delt.isEmpty) return None
    val vc = DeltaLog.list(stateDir, "verified_pairs")
      .filter(DeltaLog.isCompacted).map(_.batchId).maxOption.getOrElse(-1L)
    val resigned = rawRead(spark, stateDir, "signatures", before)
      .map(_.where(col("_batch") > vc).select("url", "_batch"))
    val resignedUrls = resigned.map(_.select("url").distinct())
    val deltKeys = delt.map(_.select("url_a", "url_b").distinct())
    val compLive = comp.map { c0 =>
      val c1 = resignedUrls.fold(c0)(r => c0
        .join(r.select(col("url").as("url_a")), Seq("url_a"), "left_anti")
        .join(r.select(col("url").as("url_b")), Seq("url_b"), "left_anti"))
      deltKeys.fold(c1)(k => c1.join(k, Seq("url_a", "url_b"), "left_anti"))
    }
    val deltLive = delt.map { d0 =>
      val sbPost = resigned.map(_.groupBy("url").agg(max("_batch").as("_sb")))
      val live = sbPost.fold(d0)(sb => d0
        .join(sb.select(col("url").as("url_a"), col("_sb").as("_sba")),
          Seq("url_a"), "left")
        .join(sb.select(col("url").as("url_b"), col("_sb").as("_sbb")),
          Seq("url_b"), "left")
        .where(col("_batch") >= coalesce(col("_sba"), lit(Long.MinValue)) &&
          col("_batch") >= coalesce(col("_sbb"), lit(Long.MinValue)))
        .drop("_sba", "_sbb"))
      live.withColumn("_rnk", row_number().over(
          Window.partitionBy("url_a", "url_b").orderBy(col("_batch").desc)))
        .where(col("_rnk") === 1).drop("_rnk")
    }
    Some((compLive.toSeq ++ deltLive.toSeq)
      .reduce(_ unionByName _).drop("_batch", "_ub"))
  }

  /** Distinct bucket values of a (small) frame — the driver-side key to
    * partition pruning. The collect is ≤ stateBuckets ints. */
  private def collectBuckets(df: DataFrame, bucket: Column): Seq[Int] =
    df.select(bucket.as("_b")).distinct().collect().map(_.getInt(0)).toSeq

  /** Bucket-pruned upsert delta — the streaming specialization of
    * IncrementalDedup.runDelta (same dirty-set / carried-pair / dirty-
    * bucket-regeneration semantics, asserted equivalent to a cold run by
    * StreamingDedupSpec) for a batch that is an UPSERT set (no deletes):
    * prev-state reads prune to the url buckets the batch touches and the
    * LSH-bucket partitions its dirty docs probe. */
  private def upsertDelta(spark: SparkSession, b: DataFrame, stateDir: String,
                          cfg: DedupConfig, bid: Long, nB: Int)
      : (IncrementalDedup.DeltaResult, Seq[DataFrame]) = {
    val before = Some(bid)

    // dirty = batch rows that are new or content-changed vs the latest
    // signature IN THE BATCH'S OWN URL BUCKETS (a batch url can only
    // collide with prev state in its own bucket)
    val touched = collectBuckets(b, urlBucket(nB))
    val prevSigsT = rawRead(spark, stateDir, "signatures", before, Some(touched))
      .map(d => dropMeta(latestPerUrl(d)))
      .getOrElse(b.sparkSession.emptyDataFrame)
    val dirtyPages =
      if (prevSigsT.columns.isEmpty) b
      else {
        val prevKeys = prevSigsT.select(col("url").as("_pu"),
          col("content_hash").as("_pch"))
        b.join(prevKeys,
          b("url") === col("_pu") && md5(b("text")) === col("_pch"),
          "left_anti")
      }

    val deltaPw = DedupStages.withIds(dirtyPages)
    // O(dirty) rows behind the whole dirty-detection + signature plan,
    // consumed by dirtyHashes, sigsForExact, sigsAll AND the delta-log
    // append: pin (released with the per-batch pins below)
    val deltaSigs = DedupStages.leanSignatures(deltaPw, cfg).cache()
    // O(dirty) rows, consumed four times (bucket collect, dirtyBuckets,
    // probeSub, delta append): pin
    val deltaProbes = IncrementalDedup.freshProbes(deltaPw, cfg).cache()
    val deltaIds = deltaPw.select("doc_id")

    // stored probes ONLY from the partitions of LSH buckets the dirty
    // docs probe; liveness vs the narrow sig-batch clock; a changed doc's
    // own stale probes drop via the dirty-id anti-join (its fresh rows
    // ride deltaProbes)
    val pbTouched = collectBuckets(deltaProbes, probeBucket(nB))
    val dirtyBuckets = deltaProbes.select("channel", "bucket_key").distinct()
    val livePrevProbes = resolvedProbes(spark, stateDir, before, Some(pbTouched))
      .getOrElse(deltaProbes.limit(0))
    val probeSub = livePrevProbes
      .join(deltaIds, Seq("doc_id"), "left_anti")
      .join(dirtyBuckets, Seq("channel", "bucket_key"), "left_semi")
      .unionByName(deltaProbes.select("channel", "bucket_key", "doc_id", "tag"))

    // exact channel: live signature rows sharing a dirty content hash.
    // The hash semi-join runs on the RAW narrow log first (urls sharing a
    // dirty hash), then latest-per-url resolves only those urls' rows —
    // the window shuffle is O(matching urls), the scan is column-pruned.
    val dirtyHashes = deltaSigs.select("content_hash").distinct()
    // empty fallback (not .get): a crash between the pages and signatures
    // appends of a prior batch leaves a pages log without a signatures
    // log — treat prev sigs as empty like prevSigsT/livePrevProbes do
    val rawSigs = rawRead(spark, stateDir, "signatures", before)
      .getOrElse(deltaSigs.limit(0).withColumn("_batch", lit(0L)))
      .drop("_ub")
    val hashUrls = rawSigs.join(dirtyHashes, Seq("content_hash"), "left_semi")
      .select("url").distinct()
    val prevSigsForExact = dropMeta(latestPerUrl(
        rawSigs.join(hashUrls, Seq("url"), "left_semi")))
      .join(deltaIds, Seq("doc_id"), "left_anti")
      .join(dirtyHashes, Seq("content_hash"), "left_semi")
    val sigsForExact = prevSigsForExact.unionByName(deltaSigs)

    val (deltaPairs0, dropped) =
      DedupStages.candidatesFromProbes(probeSub, sigsForExact, cfg)
    // tiny pair table, whole candidate-generation plan behind it: pin it
    // so its consumers (bucket collect, verify's two sides) don't re-run
    // candidate generation
    val deltaPairs = deltaPairs0.cache()

    // verify side: page text ONLY from the url buckets of pair
    // participants (bucket = pmod(doc_id, nB), derivable from the id
    // without a url join). before=None: this batch's pages delta is
    // already appended, so dirty participants resolve to their new text.
    val partBuckets = collectBuckets(
      deltaPairs.select(explode(array(col("id_a"), col("id_b"))).as("id")),
      pmod(col("id"), lit(nB.toLong)).cast("int"))
    val partPages = rawRead(spark, stateDir, "pages", None, Some(partBuckets))
      .map(d => dropMeta(latestPerUrl(d)))
      .getOrElse(b.limit(0))
    val pwSide = DedupStages.withIds(partPages)
      .withColumn("content_hash", md5(col("text")))
    val deltaVerified = DedupStages.verified(deltaPairs, pwSide, cfg)

    // carry previous live pairs not touching a dirty url (upsert model:
    // every non-dirty url survives, so anti-join the small dirty set
    // instead of semi-joining the full live-url set twice)
    val dirtyUrls = dirtyPages.select("url")
    val carried = resolvedVerified(spark, stateDir, before)
      .map(_.join(dirtyUrls.select(col("url").as("url_a")), Seq("url_a"), "left_anti")
        .join(dirtyUrls.select(col("url").as("url_b")), Seq("url_b"), "left_anti"))
      .getOrElse(deltaVerified.limit(0))

    // PINNED: consumed by connected components, the merge join, and the
    // caller reading Result.verifiedPairs. The fold dedupes pairs the
    // delta pass rediscovered between unchanged docs in a dirty bucket.
    val verifiedAll = DedupStages.foldVerified(carried, deltaVerified).cache()

    val clusters = DedupStages.clusters(verifiedAll).cache()
    // merge fold: page text only from cluster members' url buckets
    val memberBuckets = collectBuckets(clusters, urlBucket(nB))
    val memberPages = rawRead(spark, stateDir, "pages", None, Some(memberBuckets))
      .map(d => dropMeta(latestPerUrl(d)))
      .getOrElse(b.limit(0))
    val merged = DedupStages.mergedClusters(clusters, memberPages)

    // full views for the Result are LAZY unions over the whole log — the
    // per-batch work above never materializes them
    val sigsAll = resolvedSignatures(spark, stateDir, before)
      .map(_.join(deltaIds, Seq("doc_id"), "left_anti").unionByName(deltaSigs))
      .getOrElse(deltaSigs)
    val probesAll = resolvedProbes(spark, stateDir, before)
      .map(_.join(deltaIds, Seq("doc_id"), "left_anti")
        .unionByName(deltaProbes.select("channel", "bucket_key", "doc_id", "tag")))
      .getOrElse(deltaProbes.select("channel", "bucket_key", "doc_id", "tag"))

    (IncrementalDedup.DeltaResult(
      DedupPipeline.Result(sigsAll, probesAll, deltaPairs, dropped, verifiedAll,
        clusters, merged),
      deltaSignatures = deltaSigs,
      deltaProbes = deltaProbes.select("channel", "bucket_key", "doc_id", "tag"),
      deltaVerified = deltaVerified),
      // per-batch cache pins, released by processBatch after the output
      // commits — without this a long-running stream accumulates cached
      // plans/blocks in the CacheManager without bound
      Seq(deltaSigs, deltaProbes, deltaPairs, verifiedAll, clusters))
  }

  /** Fold one upsert batch into the persisted state; returns the new
    * pipeline result (clusters/merged also committed to the state dir).
    * `stateBuckets` fixes the partitioned state layout — use the same
    * value for every batch of a state dir. */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   cfg: DedupConfig = DedupConfig(), batchId: Long = -1L,
                   compactEvery: Int = 8,
                   stateBuckets: Int = defaultStateBuckets): DedupPipeline.Result = {
    val nB = stateBuckets
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
    val havePrev = rawRead(spark, stateDir, "pages", before).exists(!_.isEmpty)

    // pages delta first (url-bucketed): the resolved log then already
    // carries this batch's text for participant/member reads
    DeltaLog.append(b.withColumn("_ub", urlBucket(nB)), stateDir, "pages", bid,
      partitionCols = Seq("_ub"))

    val (result, pins) =
      if (!havePrev) {
        // cold start: the whole batch is the delta
        val r = DedupPipeline.run(spark, b, cfg)
        DeltaLog.append(r.signatures.withColumn("_ub", urlBucket(nB)),
          stateDir, "signatures", bid, partitionCols = Seq("_ub"))
        DeltaLog.append(r.probes.withColumn("_ub", probeBucket(nB)),
          stateDir, "probes", bid, partitionCols = Seq("_ub"))
        DeltaLog.append(r.verifiedPairs.withColumn("_ub", pairBucket(nB)),
          stateDir, "verified_pairs", bid, partitionCols = Seq("_ub"))
        (r, Seq(r.signatures, r.verifiedPairs, r.candidatePairs))
      } else {
        val (d, p) = upsertDelta(spark, b, stateDir, cfg, bid, nB)
        // O(dirty) state writes: ONLY this pass's increments are appended
        DeltaLog.append(d.deltaSignatures.withColumn("_ub", urlBucket(nB)),
          stateDir, "signatures", bid, partitionCols = Seq("_ub"))
        DeltaLog.append(d.deltaProbes.withColumn("_ub", probeBucket(nB)),
          stateDir, "probes", bid, partitionCols = Seq("_ub"))
        DeltaLog.append(d.deltaVerified.withColumn("_ub", pairBucket(nB)),
          stateDir, "verified_pairs", bid, partitionCols = Seq("_ub"))
        (d.full, p)
      }

    // derived outputs: full commits, bounded by the duplicate population
    val fp = s"batch-$bid"
    val ch = cfg.configHash
    val mer = TableIO.commit(result.merged, stateDir, "merged_clusters", ch, fp)
    val clu = TableIO.commit(result.clusters, stateDir, "clusters", ch, fp)

    // LSM-style compaction keeps the delta count bounded; the rewritten
    // deltas preserve both `_batch` stamps (liveness) and `_ub` layout
    // (pruning)
    if (compactEvery > 0 && DeltaLog.list(stateDir, "pages").size > compactEvery) {
      DeltaLog.compact(spark, stateDir, "pages",
        latestPerUrl(DeltaLog.read(spark, stateDir, "pages").get), bid,
        partitionCols = Seq("_ub"))
      val sigsStamped = latestPerUrl(DeltaLog.read(spark, stateDir, "signatures").get)
        .localCheckpoint(true) // pin: consumed by probes + verified liveness
      DeltaLog.compact(spark, stateDir, "signatures", sigsStamped, bid,
        partitionCols = Seq("_ub"))
      val probes = DeltaLog.read(spark, stateDir, "probes").get
        .join(sigsStamped.select(col("doc_id"), col("_batch").as("_sig_batch")),
          Seq("doc_id"))
        .where(col("_batch") === col("_sig_batch")).drop("_sig_batch")
      DeltaLog.compact(spark, stateDir, "probes", probes, bid,
        partitionCols = Seq("_ub"))
      val sb = sigsStamped.select(col("url"), col("_batch").as("_sb"))
      val ver = DeltaLog.read(spark, stateDir, "verified_pairs").get
        .join(sb.select(col("url").as("url_a"), col("_sb").as("_sba")), Seq("url_a"))
        .join(sb.select(col("url").as("url_b"), col("_sb").as("_sbb")), Seq("url_b"))
        .where(col("_batch") >= col("_sba") && col("_batch") >= col("_sbb"))
        .withColumn("_rnk", row_number().over(
          Window.partitionBy("url_a", "url_b").orderBy(col("_batch").desc)))
        .where(col("_rnk") === 1).drop("_rnk", "_sba", "_sbb")
      DeltaLog.compact(spark, stateDir, "verified_pairs", ver, bid,
        partitionCols = Seq("_ub"))
      sigsStamped.unpersist()
    }

    // release this batch's cache pins: outputs are committed, and the
    // returned Result reads resolved views from the log (candidatePairs /
    // droppedBuckets recompute lazily if a caller consumes them)
    pins.foreach(_.unpersist())

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
             compactEvery: Int = 8,
             stateBuckets: Int = defaultStateBuckets): StreamingQuery =
    pagesStream.writeStream
      .outputMode("update")
      .trigger(trigger)
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, cfg, batchId,
          compactEvery, stateBuckets): Unit
      }
      .start()
}
