package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._
import graft.functions.TextColumns
import graft.functions.signatures._
import graft.io.TableIO

/**
 * Configuration of the near-duplicate pipeline — the graft analog of the
 * reference's dedup knobs (key families, candidate caps, match gates;
 * classes/RecordManager.php:1296-1310,1333,1402-1410,1482-1623).
 *
 * Defaults: 3-word shingles, MinHash k=128 split into 32 bands × 4 rows
 * (LSH s-curve threshold (1/32)^(1/4) ≈ 0.42 → pairs at the verify
 * threshold J ≥ 0.7 are banded with p ≈ 1-(1-0.7^4)^32 ≈ 0.9998), 64-bit
 * SimHash probed in 4×16-bit chunks (pigeonhole-complete for Hamming ≤ 3),
 * and an exact content-hash channel (recall 1.0 at J = 1).
 */
final case class DedupConfig(
    shingleSize: Int = 3,
    minhashK: Int = 128,
    bands: Int = 32,
    rowsPerBand: Int = 4,
    simhashMaxHamming: Int = 3,
    jaccardThreshold: Double = 0.7,
    /** skew guard: LSH band / SimHash probe buckets larger than this are
      * dropped (and logged) — the analog of the reference's
      * 1000-candidates-per-key cap (classes/RecordManager.php:1402-1410). */
    bucketCap: Int = 1000,
    /** reference gate: candidates only across sources
      * (classes/RecordManager.php:1346). Off by default for web text —
      * same-host near-dups are real duplicates there. */
    crossSourceOnly: Boolean = false,
    /** reference gate: format (≡ lang) equality required
      * (classes/RecordManager.php:1489-1497). */
    requireSameLang: Boolean = false,
    seed: Long = 42L) {

  require(minhashK == bands * rowsPerBand, "minhashK must equal bands*rowsPerBand")

  /** Stable config fingerprint for checkpoint reuse (the reference keys
    * its memoized worklists on md5 of the query params,
    * classes/SolrUpdater.php:341-347). */
  def configHash: String = {
    val s = productIterator.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

/**
 * The five reference dedup stages (SURVEY.md §3.1) re-expressed Spark-first
 * over `pages(url, warc_ts, html, text, lang)` rows:
 *
 *   candidate keys   → signatures (shingles, MinHash, SimHash, content md5)
 *   index probes     → band/probe self-joins (equi-joins Catalyst plans as
 *                      shuffled hash / sort-merge; AQE splits skewed keys)
 *   matchRecords     → exact-Jaccard verification + gates
 *   union-find       → large-star/small-star connected components
 *   cluster merge    → groupBy(cluster).agg fold
 *
 * Every stage is a pure DataFrame → DataFrame function so the driver can
 * checkpoint/resume between any two (graft.io.TableIO).
 */
object DedupStages {

  // ---------------------------------------------------------------- pages

  /** Derive the mandated pages(url, warc_ts, html, text, lang) shape
    * deterministically from the harness `documents` table (doc_id, text,
    * lang, source, n_chars). The hostname carries the reference's
    * `source_id` role (FIXTURES.md §1). */
  def pagesFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://"), col("source"), lit(".example.com/doc/"), col("doc_id")).as("url"),
      expr("timestampadd(HOUR, doc_id, timestamp'2024-01-01 00:00:00')").as("warc_ts"),
      concat(lit("<html><body>"), col("text"), lit("</body></html>")).cast("binary").as("html"),
      col("text"),
      col("lang"),
      col("source"))

  /** Extract source from a pages row that lacks the explicit column
    * (true Common-Crawl input): the url hostname. */
  def withSource(pages: DataFrame): DataFrame =
    if (pages.columns.contains("source")) pages
    else pages.withColumn("source", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))

  // ----------------------------------------------------------- signatures

  /** Stage 1 — per-document signatures, all in one scan-side projection
    * (one pass over text; every function is codegen'd, incl. the custom
    * MinHash/SimHash/shingle expressions in graft.functions).
    *
    * Columns: url, source, lang, content_hash, n_tokens, shingles
    * (distinct hashed n-grams), n_shingles, minhash (array<bigint> k),
    * simhash (bigint). */
  def signatures(pages: DataFrame, cfg: DedupConfig): DataFrame = {
    val toks = TextColumns.tokenHashes(col("text"))
    withSource(pages)
      .select(
        col("url"), col("source"), col("lang"),
        md5(col("text")).as("content_hash"),
        toks.as("token_hashes"))
      .select(
        col("url"), col("source"), col("lang"), col("content_hash"),
        size(col("token_hashes")).as("n_tokens"),
        array_distinct(TextColumns.shingleHashes(col("token_hashes"), cfg.shingleSize)).as("shingles"),
        simhash64(col("token_hashes")).as("simhash"))
      .select(
        col("url"), col("source"), col("lang"), col("content_hash"),
        col("n_tokens"),
        col("shingles"),
        size(col("shingles")).as("n_shingles"),
        minhashSignature(col("shingles"), cfg.minhashK, cfg.seed).as("minhash"),
        col("simhash"))
  }

  // ------------------------------------------------------------ channels

  /** LSH band table: (band_id, band_hash, url). The explode is the analog
    * of the reference's per-record key arrays feeding sparse indexes
    * (classes/RecordManager.php:1298-1309, dbscripts/mongo.js:2-4). */
  def lshBands(sigs: DataFrame, cfg: DedupConfig): DataFrame =
    sigs
      .where(col("n_shingles") > 0)
      .select(col("url"),
        posexplode(lshBandHashes(col("minhash"), cfg.bands, cfg.rowsPerBand))
          .as(Seq("band_id", "band_hash")))

  /** Buckets larger than the cap are degenerate (boilerplate) — drop them,
    * like the reference's too-many-candidates guard
    * (classes/RecordManager.php:1402-1410). Returns (kept, dropped-log). */
  def capBuckets(table: DataFrame, keyCols: Seq[String], cap: Int): (DataFrame, DataFrame) = {
    val counts = table.groupBy(keyCols.map(col): _*).agg(F.count(lit(1)).as("bucket_n"))
    val keyed = table.join(counts, keyCols)
    (keyed.where(col("bucket_n") <= cap).drop("bucket_n"),
      counts.where(col("bucket_n") > cap))
  }

  /** Self-join pairs within equal buckets, canonicalized url_a < url_b.
    * Catalyst plans this as a shuffled equi-join on the bucket key; AQE
    * skew-join splitting backstops any residual hot key below the cap. */
  private def bucketPairs(table: DataFrame, keyCols: Seq[String], channel: String): DataFrame = {
    val l = table.select(keyCols.map(col) :+ col("url").as("url_a"): _*)
    val r = table.select(keyCols.map(col) :+ col("url").as("url_b"): _*)
    l.join(r, keyCols)
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), lit(channel).as("channel"))
      .distinct()
  }

  /** Channel 1 — MinHash LSH band join. */
  def lshCandidates(sigs: DataFrame, cfg: DedupConfig): (DataFrame, DataFrame) = {
    val (kept, dropped) = capBuckets(lshBands(sigs, cfg), Seq("band_id", "band_hash"), cfg.bucketCap)
    (bucketPairs(kept, Seq("band_id", "band_hash"), "minhash_lsh"), dropped)
  }

  /** SimHash probe table: 4 × 16-bit chunks. Any pair within Hamming
    * distance ≤ 3 of each other agrees exactly on ≥ 1 chunk (pigeonhole),
    * so the chunk equi-join is a complete candidate generator for d ≤ 3. */
  def simhashProbes(sigs: DataFrame): DataFrame = {
    val chunks = array((0 until 4).map(i =>
      struct(lit(i).as("probe_id"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("probe_val"))): _*)
    sigs.where(col("n_shingles") > 0)
      .select(col("url"), col("simhash"), explode(chunks).as("p"))
      .select(col("url"), col("simhash"), col("p.probe_id"), col("p.probe_val"))
  }

  /** Channel 2 — SimHash Hamming-ball probing: chunk equi-join + exact
    * Hamming residual via bit_count(xor). */
  def simhashCandidates(sigs: DataFrame, cfg: DedupConfig): (DataFrame, DataFrame) = {
    val probes = simhashProbes(sigs)
    val (kept, dropped) = capBuckets(probes, Seq("probe_id", "probe_val"), cfg.bucketCap)
    val l = kept.select(col("probe_id"), col("probe_val"), col("url").as("url_a"), col("simhash").as("sh_a"))
    val r = kept.select(col("probe_id"), col("probe_val"), col("url").as("url_b"), col("simhash").as("sh_b"))
    val pairs = l.join(r, Seq("probe_id", "probe_val"))
      .where(col("url_a") < col("url_b"))
      .where(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= cfg.simhashMaxHamming)
      .select(col("url_a"), col("url_b"), lit("simhash").as("channel"))
      .distinct()
    (pairs, dropped)
  }

  /** Channel 3 — exact content hash. Within an identical-text group the
    * component is fully determined, so emit a STAR (min-url rep → member)
    * instead of all O(m²) pairs — same connected components, linear size.
    * (Analog of the reference's shared-ISBN immediate match,
    * classes/RecordManager.php:1500-1512.) */
  def exactCandidates(sigs: DataFrame): DataFrame = {
    val reps = sigs.groupBy(col("content_hash")).agg(F.min(col("url")).as("url_a"), F.count(lit(1)).as("m"))
      .where(col("m") > 1).drop("m")
    sigs.join(reps, "content_hash")
      .where(col("url") =!= col("url_a"))
      .select(col("url_a"), col("url").as("url_b"), lit("exact").as("channel"))
  }

  /** All channels unioned with provenance (channels collected per pair —
    * the reference records which key family produced a match only in logs;
    * we keep it queryable). Returns (pairs, droppedBucketsLog). */
  def candidates(sigs: DataFrame, cfg: DedupConfig): (DataFrame, DataFrame) = {
    val (lsh, dropLsh) = lshCandidates(sigs, cfg)
    val (sim, dropSim) = simhashCandidates(sigs, cfg)
    val exact = exactCandidates(sigs)
    val pairs = lsh.unionByName(sim).unionByName(exact)
      .groupBy(col("url_a"), col("url_b"))
      .agg(sort_array(collect_set(col("channel"))).as("channels"))
    val dropped = dropLsh.select(lit("minhash_lsh").as("channel"),
        col("band_hash").as("bucket_key"), col("bucket_n"))
      .unionByName(dropSim.select(lit("simhash").as("channel"),
        col("probe_val").cast("long").as("bucket_key"), col("bucket_n")))
    (pairs, dropped)
  }

  // ---------------------------------------------------------------- verify

  /** Stage 3 — verification (the `matchRecords` analog,
    * classes/RecordManager.php:1482-1623): exact Jaccard over distinct
    * shingle sets with hard gates. Exact-channel pairs are identical text
    * (J = 1) and skip the set arithmetic. */
  def verified(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val side = sigs.select(col("url"), col("source"), col("lang"), col("shingles"),
      col("n_shingles"), col("content_hash"))
    val a = side.toDF(side.columns.map(_ + "_a"): _*)
    val b = side.toDF(side.columns.map(_ + "_b"): _*)
    var joined = pairs
      .join(a, "url_a")
      .join(b, "url_b")
    if (cfg.requireSameLang) joined = joined.where(col("lang_a") === col("lang_b"))
    if (cfg.crossSourceOnly) joined = joined.where(col("source_a") =!= col("source_b"))
    joined
      .select(col("url_a"), col("url_b"), col("channels"),
        size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("long").as("n_inter"),
        col("n_shingles_a").cast("long").as("na"), col("n_shingles_b").cast("long").as("nb"))
      .select(col("url_a"), col("url_b"), col("channels"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union").cast("double"))
      .where(col("jaccard") >= cfg.jaccardThreshold)
  }

  // -------------------------------------------------------------- clusters

  /** Stage 4 — clustering: connected components over verified pairs.
    * cluster_id = lexicographic min url of the component. */
  def clusters(verifiedPairs: DataFrame): DataFrame =
    ConnectedComponents.run(verifiedPairs.select(col("url_a"), col("url_b")))
      .select(col("vertex").as("url"), col("component").as("cluster_id"))

  /** Stage 5 — cluster merge (the `mergeRecords` fold,
    * classes/SolrUpdater.php:1204-1268): members collected, representative
    * = longest text (reference keeps the longest string per merged field)
    * with min-url tiebreak, langs unioned. */
  def mergedClusters(clusters: DataFrame, pages: DataFrame): DataFrame = {
    val p = withSource(pages).select(col("url"), col("text"), col("lang"), col("source"))
    clusters.join(p, "url")
      .groupBy(col("cluster_id"))
      .agg(
        F.count(lit(1)).as("size"),
        sort_array(collect_list(col("url"))).as("members"),
        F.max(struct(length(col("text")).as("len"),
          // min-url tiebreak under max(): invert the url ordering bytewise
          col("url"), col("text"))).getField("text").as("rep_text"),
        F.min(struct((-length(col("text"))).as("neg_len"), col("url")))
          .getField("url").as("rep_url"),
        sort_array(collect_set(col("lang"))).as("langs"),
        sort_array(collect_set(col("source"))).as("sources"))
  }
}

/** End-to-end orchestration with optional per-stage checkpoint/resume. */
object DedupPipeline {

  final case class Result(
      signatures: DataFrame,
      candidatePairs: DataFrame,
      droppedBuckets: DataFrame,
      verifiedPairs: DataFrame,
      clusters: DataFrame,
      merged: DataFrame)

  /** Fingerprint of the input snapshot for checkpoint-reuse decisions:
    * row count + hash-sum of (url, content identity). Cheap single scan. */
  def inputFingerprint(pages: DataFrame): String = {
    val r = pages.agg(
      count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(url, md5(text)))"), lit(0L)).as("h")).head()
    s"${r.getLong(0)}-${java.lang.Long.toHexString(r.getLong(1))}"
  }

  def run(spark: SparkSession, pages: DataFrame, cfg: DedupConfig = DedupConfig(),
          checkpointRoot: Option[String] = None): Result = {
    val ch = cfg.configHash
    val fp = checkpointRoot.map(_ => inputFingerprint(pages)).getOrElse("nofp")

    val sigs = TableIO.stage(spark, checkpointRoot, "signatures", ch, fp) {
      DedupStages.signatures(pages, cfg)
    }
    // pair generation consumes the signature table twice (bands + verify);
    // cache when not checkpoint-backed
    val sigsC = if (checkpointRoot.isEmpty) sigs.cache() else sigs

    val (cand, dropped) = DedupStages.candidates(sigsC, cfg)
    val candC = TableIO.stage(spark, checkpointRoot, "candidate_pairs", ch, fp)(cand)
    val droppedC = TableIO.stage(spark, checkpointRoot, "dropped_buckets", ch, fp)(dropped)

    val ver = TableIO.stage(spark, checkpointRoot, "verified_pairs", ch, fp) {
      DedupStages.verified(candC, sigsC, cfg)
    }
    val clu = TableIO.stage(spark, checkpointRoot, "clusters", ch, fp) {
      DedupStages.clusters(ver)
    }
    val merged = TableIO.stage(spark, checkpointRoot, "merged_clusters", ch, fp) {
      DedupStages.mergedClusters(clu, pages)
    }
    Result(sigsC, candC, droppedC, ver, clu, merged)
  }
}
