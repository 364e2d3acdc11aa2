package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

/**
 * Incremental re-dedup of a new `pages` snapshot against a previous run —
 * the Spark form of the reference's dirty-record pass:
 *
 *  - content-hash short-circuit: rows whose (url, md5(text)) is unchanged
 *    keep their previous signatures, no recompute
 *    (classes/RecordManager.php:1059-1066)
 *  - `update_needed` dirty set: only added/changed docs are re-signed,
 *    and candidate generation runs only over probe buckets that CONTAIN a
 *    dirty doc — the batch equivalent of probing the key indexes per
 *    dirty record (classes/RecordManager.php:559-565,1326-1427)
 *  - pairs between two unchanged docs are carried over from the previous
 *    verified table; pairs touching a changed/deleted doc are dropped and
 *    (for changed docs) rediscovered
 *  - deletes propagate: a vanished url loses its membership and the
 *    cluster re-forms without it (cluster shrink/dissolve,
 *    classes/RecordManager.php:1739-1761)
 *
 * Known (documented) deviation from a cold full run: an over-cap bucket
 * that falls back under the cap purely through deletions of untouched
 * members is not re-expanded until one of its members changes — the same
 * history dependence the reference's hot-key memo has
 * (classes/RecordManager.php:1402-1410).
 */
object IncrementalDedup {

  /** Previous run's persisted state: the lean signature table, the
    * fixed-width probe index (channel, bucket_key, doc_id, tag — the
    * `probes` checkpoint stage `DedupPipeline.run` commits), and the
    * verified-pairs table. With the probe index stored, the incremental
    * pass never rescans unchanged documents' TEXT: unchanged probes are
    * read back as narrow fixed-width rows and only dirty docs are
    * re-shingled/re-hashed — O(dirty), not O(corpus). */
  final case class PrevState(signatures: DataFrame, probes: DataFrame,
                             verifiedPairs: DataFrame)

  /** The probe rows freshly generated for the dirty set only — exposed so
    * tests (and metrics) can assert the incremental pass's input scan
    * scales with the dirty set, not the corpus. */
  def freshProbes(deltaPw: DataFrame, cfg: DedupConfig): DataFrame =
    DedupStages.probeRows(deltaPw, cfg)

  /** `full` is the complete new state (what a cold consumer reads);
    * the `delta*` frames are the O(dirty) INCREMENTS of this pass — what a
    * delta-log writer persists per batch (graft.io.DeltaLog, used by
    * StreamingDedup): fresh signature rows, fresh probe rows, and the
    * newly verified pairs (pairs between two unchanged docs are carried
    * in `full` but never re-written). */
  final case class DeltaResult(full: DedupPipeline.Result,
                               deltaSignatures: DataFrame,
                               deltaProbes: DataFrame,
                               deltaVerified: DataFrame)

  def run(spark: SparkSession, prev: PrevState, newPages: DataFrame,
          cfg: DedupConfig = DedupConfig()): DedupPipeline.Result =
    runDelta(spark, prev, newPages, cfg).full

  def runDelta(spark: SparkSession, prev: PrevState, newPages: DataFrame,
               cfg: DedupConfig = DedupConfig()): DeltaResult = {
    val pagesSrc = DedupStages.withSource(newPages)
    val newHashes = pagesSrc.select(col("url"), md5(col("text")).as("ch"))

    // unchanged = same url AND same content hash as the previous run
    val oldSigs = prev.signatures
    val unchangedSigs = oldSigs.join(newHashes,
      oldSigs("url") === newHashes("url") &&
        oldSigs("content_hash") === newHashes("ch"), "left_semi")

    // dirty = added or content-changed rows of the new snapshot
    val oldKeys = oldSigs.select(col("url").as("u"), col("content_hash").as("ch"))
    val dirtyPages = pagesSrc.join(oldKeys,
      pagesSrc("url") === oldKeys("u") &&
        md5(pagesSrc("text")) === oldKeys("ch"), "left_anti")

    // re-sign only the dirty rows (lean rows; see leanSignatures). Ids are
    // xxhash64(url) (DedupStages.withIds) — globally deterministic, so a
    // changed url keeps the SAME doc_id across rounds (its stale probes
    // are dropped by the unchanged semi-join below and replaced by fresh
    // ones) and no driver-side max-id action is needed.
    val deltaSigs = DedupStages.leanSignatures(DedupStages.withIds(dirtyPages), cfg)
    val sigs = unchangedSigs.unionByName(deltaSigs).cache()
    val deltaIds = deltaSigs.select("doc_id")

    // id -> text side; consumed ONLY for (a) dirty-doc probe generation
    // and (b) the verify stage, which semi-joins to pair participants
    // before shingling — no unchanged-doc text is ever re-read in full
    val pw = sigs.select("doc_id", "url", "source", "lang", "content_hash")
      .join(pagesSrc.select("url", "text"), Seq("url")).cache()
    val deltaPw = pw.join(deltaIds, Seq("doc_id"), "left_semi")

    // probe rows: freshly computed for DIRTY docs only; unchanged docs'
    // probes come from the stored index (narrow fixed-width rows, no text).
    // Pinned: consumed three times (dirtyBuckets, probeSub, probesAll) and
    // small (O(dirty) rows)
    val deltaProbes = freshProbes(deltaPw, cfg).cache()
    val unchangedProbes = prev.probes
      .join(unchangedSigs.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("channel", "bucket_key", "doc_id", "tag")
    // candidate regeneration only in buckets touching a dirty doc
    val dirtyBuckets = deltaProbes.select("channel", "bucket_key").distinct()
    val probeSub = unchangedProbes
      .unionByName(deltaProbes.select("channel", "bucket_key", "doc_id", "tag"))
      .join(dirtyBuckets, Seq("channel", "bucket_key"), "left_semi")
    // exact channel restricted the same way: only content-hash groups
    // containing a dirty doc are re-grouped (unchanged-unchanged exact
    // pairs are carried over with the rest of the verified table)
    val dirtyHashes = sigs.join(deltaIds, Seq("doc_id"), "left_semi")
      .select("content_hash").distinct()
    val sigsForExact = sigs.join(dirtyHashes, Seq("content_hash"), "left_semi")
    val (deltaPairs0, dropped) =
      DedupStages.candidatesFromProbes(probeSub, sigsForExact, cfg)
    // tiny pair table, whole candidate-generation plan behind it: pin it
    // so verified()'s two consumers don't re-run candidate generation
    val deltaPairs = deltaPairs0.cache()
    val deltaVerified = DedupStages.verified(deltaPairs, pw, cfg)

    // carry over previous pairs whose BOTH endpoints are unchanged urls
    val liveUrls = unchangedSigs.select(col("url"))
    val carried = prev.verifiedPairs
      .join(liveUrls.select(col("url").as("url_a")), Seq("url_a"), "left_semi")
      .join(liveUrls.select(col("url").as("url_b")), Seq("url_b"), "left_semi")

    // PINNED: the carried-pair union plan (two semi-joins over the whole
    // previous verified table + the delta verify) is consumed by connected
    // components, by the merge join, and by the caller reading
    // Result.verifiedPairs — without the cache it would execute once per
    // consumer (≥3×; expensive when the carried table is a 100-TB run's
    // pair population)
    val verifiedAll = DedupStages.foldVerified(carried, deltaVerified).cache()

    val clusters = DedupStages.clusters(verifiedAll)
    val merged = DedupStages.mergedClusters(clusters, pagesSrc)
    // updated probe index for the NEXT incremental round: stored probes of
    // surviving unchanged docs + fresh dirty-doc probes
    val probesAll = unchangedProbes
      .unionByName(deltaProbes.select("channel", "bucket_key", "doc_id", "tag"))
    DeltaResult(
      DedupPipeline.Result(sigs, probesAll, deltaPairs, dropped, verifiedAll,
        clusters, merged),
      deltaSignatures = deltaSigs,
      deltaProbes = deltaProbes.select("channel", "bucket_key", "doc_id", "tag"),
      deltaVerified = deltaVerified)
  }
}
