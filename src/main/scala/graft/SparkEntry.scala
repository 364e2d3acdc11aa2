package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.normalization._
import graft.ops.{Multimodal, Similarity, TextStats}
import graft.pipeline.{DedupConfig, DedupPipeline, DedupStages}

/**
 * Driver contract (see SURVEY.md §5.5): every implemented operator from
 * SURVEY.md §2 is exposed as a named query over the harness tables in
 * `sfDir`, with an ANSI-SQL DuckDB oracle where the semantics are
 * SQL-expressible (non-SQL operators — MinHash/LSH/SimHash internals —
 * get rows-only checks).
 *
 * Naming/aliasing rule: Spark output column names match the oracle SQL
 * aliases exactly; count-like columns are cast to BIGINT on the Spark
 * side because DuckDB's len()/count() produce BIGINT.
 */
object SparkEntry {

  /** Pipeline config used by all dedup queries (and their oracles). */
  val cfg: DedupConfig = DedupConfig()

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def pages(s: SparkSession, dir: String): DataFrame =
    DedupStages.pagesFromDocuments(docs(s, dir))

  /** One pipeline run per (session, sfDir), cached — several queries
    * expose different stages of the same run. */
  private val pipelineCache =
    new scala.collection.concurrent.TrieMap[(Int, String), DedupPipeline.Result]()
  private def pipe(s: SparkSession, dir: String): DedupPipeline.Result =
    pipelineCache.getOrElseUpdate((System.identityHashCode(s), dir), {
      val r = DedupPipeline.run(s, pages(s, dir), cfg)
      DedupPipeline.Result(
        r.signatures.cache(), r.candidatePairs.cache(), r.droppedBuckets.cache(),
        r.verifiedPairs.cache(), r.clusters.cache(), r.merged.cache())
    })

  /** Flagship: the full dedup pipeline end-to-end on sf0.001 — returns
    * per-stage row counts (always non-empty; exercises every stage). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val r = pipe(spark, "/root/testdata/sf0.001")
    Seq(
      ("signatures", r.signatures.count()),
      ("candidate_pairs", r.candidatePairs.count()),
      ("verified_pairs", r.verifiedPairs.count()),
      ("clusters", r.clusters.count()),
      ("merged_clusters", r.merged.count()),
      ("dropped_buckets", r.droppedBuckets.count())
    ).toDF("stage", "rows")
  }

  // ---------------------------------------------------------------------
  // shared SQL fragments for the oracles
  private val urlSql = "'https://' || source || '.example.com/doc/' || doc_id"
  /** DuckDB equivalent of graft.text.Normalize.normalize for ASCII input
    * (the harness corpus is ASCII; the full Latin-1 contract is covered by
    * byte-level unit tests, not the oracle). */
  private val normSql = "lower(regexp_replace(%s, '[^0-9A-Za-z\\[\\]\\^_`]', '', 'g'))"
  /** Shingle sets + pairwise exact Jaccard (the oracle for the LSH +
    * verify channels): 3-token shingles joined with a separator byte. */
  private val shingleCte =
    s"""d AS (SELECT $urlSql AS url, source, lang, text, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT url, source, lang, text,
       |  CASE WHEN len(w) < 3 THEN [array_to_string(w, chr(31))]
       |       ELSE list_distinct([w[i] || chr(31) || w[i+1] || chr(31) || w[i+2] for i in range(1, len(w) - 1)])
       |  END AS s FROM d),
       |jp AS (SELECT a.url AS url_a, b.url AS url_b,
       |  len(list_intersect(a.s, b.s)) AS i,
       |  len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u,
       |  least(len(a.s), len(b.s)) AS mn,
       |  a.lang = b.lang AS same_lang, a.source <> b.source AS cross_src
       |  FROM sh a JOIN sh b ON a.url < b.url)""".stripMargin

  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------- sources / projection (SURVEY §2.1, §2.2)
    "q_pages" -> ((s, dir) =>
      pages(s, dir).select(
        col("url"),
        date_format(col("warc_ts"), "yyyy-MM-dd HH:mm:ss").as("warc_ts_str"),
        col("text"), col("lang"), col("source"))),

    "q_normalize" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), normalizeText(col("text")).as("norm_text"))),

    "q_title_key" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), titleKey(col("text")).as("title_key"))),

    "q_content_hash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), md5(col("text")).as("content_hash"))),

    "q_media_meta" -> ((s, dir) =>
      Multimodal.mediaMeta(pages(s, dir))
        .select(col("url"), col("byte_length"), col("magic_hex"))),

    "q_id_sort_key" -> ((s, dir) =>
      pages(s, dir).select(col("url"),
        regexp_extract(col("url"), "(\\d+)$", 1).as("sort_key"))),

    "q_isbn13" -> ((s, dir) => {
      val isbn10 = lpad(col("doc_id").cast("string"), 9, "0")
      def d(i: Int) = substring(isbn10, i + 1, 1).cast("int")
      val sum = lit(38) + lit(3) * (d(0) + d(2) + d(4) + d(6) + d(8)) + d(1) + d(3) + d(5) + d(7)
      val check = (lit(10) - (sum % 10)) % 10
      docs(s, dir).select(col("doc_id"),
        concat(lit("978"), isbn10, check.cast("string")).as("isbn13"))
    }),

    "q_hier_facet" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        array(concat(lit("0/"), col("source"), lit("/")),
          concat(lit("1/"), col("source"), lit("/"), col("lang"), lit("/"))).as("facets"))),

    // ----------------------------- filters / incremental (SURVEY §2.3, §2.9)
    "q_watermark" -> ((s, dir) =>
      pages(s, dir)
        .where(col("warc_ts") >= lit("2024-01-11 00:00:00").cast("timestamp"))
        .groupBy("source").agg(count(lit(1)).as("n"))),

    "q_snapshot_diff" -> ((s, dir) => {
      val old = docs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
      val nw = docs(s, dir).where(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
      old.as("o").join(nw.as("n"), old("doc_id") === nw("doc_id"), "full_outer")
        .select(
          coalesce(old("doc_id"), nw("doc_id")).as("doc_id"),
          when(nw("doc_id").isNull, "deleted")
            .when(old("h") =!= nw("h"), "changed")
            .otherwise("unchanged").as("status"))
    }),

    "q_mark_sweep" -> ((s, dir) => {
      val seen = docs(s, dir).where(col("doc_id") % 7 =!= 0).select("doc_id")
      docs(s, dir).join(seen, Seq("doc_id"), "left_anti").select("doc_id", "source")
    }),

    "q_events_page" -> ((s, dir) =>
      events(s, dir).orderBy(col("ts"), col("event_id"))
        .select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("event_type"))
        .offset(100).limit(50)),

    // ----------------------------------- aggregation / sort (SURVEY §2.5, §2.6)
    "q_vocab" -> ((s, dir) =>
      TextStats.vocabCounts(docs(s, dir)).select(col("token"), col("n"))),

    "q_lang_counts" -> ((s, dir) =>
      docs(s, dir).groupBy("lang").agg(count(lit(1)).as("n"))),

    "q_source_lang" -> ((s, dir) =>
      docs(s, dir).groupBy("source", "lang").agg(count(lit(1)).as("n"))),

    "q_longest_per_source" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy(length(col("text")).desc, col("doc_id"))
      docs(s, dir).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select("source", "doc_id")
    }),

    "q_quality" -> ((s, dir) =>
      TextStats.qualityFeatures(docs(s, dir)).select(
        col("doc_id"),
        col("char_count").cast("long").as("char_count"),
        col("word_count").cast("long").as("word_count"),
        col("distinct_words").cast("long").as("distinct_words"),
        col("stopword_count").cast("long").as("stopword_count"),
        col("distinct_permille"))),

    // -------------------------------------- dedup channels (SURVEY §2.4, §7.0)
    "q_exact_dup_pairs" -> ((s, dir) => {
      val p = pages(s, dir).select(col("url"), md5(col("text")).as("h"))
      val a = p.select(col("url").as("url_a"), col("h"))
      val b = p.select(col("url").as("url_b"), col("h"))
      a.join(b, "h").where(col("url_a") < col("url_b")).select("url_a", "url_b")
    }),

    "q_exact_clusters" -> ((s, dir) => {
      val p = pages(s, dir).select(col("url"), md5(col("text")).as("h"))
      val g = p.groupBy("h").agg(min("url").as("cluster_id"), count(lit(1)).as("c"))
        .where(col("c") > 1).drop("c")
      p.join(g, "h").select("url", "cluster_id")
    }),

    "q_signatures" -> ((s, dir) =>
      DedupStages.signatures(pages(s, dir), cfg).select(
        col("url"), col("content_hash"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_shingles").cast("long").as("n_shingles"),
        col("simhash"))),

    "q_minhash_sig" -> ((s, dir) =>
      // full-array signature view (the pipeline itself stores lean rows
      // and fuses the arrays into probe generation)
      DedupStages.signatures(pages(s, dir), cfg).select(col("url"), col("minhash"))),

    "q_lsh_bands" -> ((s, dir) => {
      val sigs = DedupStages.signatures(pages(s, dir), cfg).cache()
      DedupStages.lshBands(sigs, cfg)
        .join(sigs.select(col("doc_id"), col("url")), "doc_id")
        .select(col("url"), col("band_id").cast("long").as("band_id"), col("band_hash"))
    }),

    "q_candidate_pairs" -> ((s, dir) => {
      val sigs = pipe(s, dir).signatures
      pipe(s, dir).candidatePairs
        .join(sigs.select(col("doc_id").as("id_a"), col("url").as("ua")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("url").as("ub")), "id_b")
        .select(least(col("ua"), col("ub")).as("url_a"),
          greatest(col("ua"), col("ub")).as("url_b"), col("channels"))
    }),

    "q_dropped_buckets" -> ((s, dir) =>
      pipe(s, dir).droppedBuckets.select("channel", "bucket_key", "bucket_n")),

    "q_simhash_pairs" -> ((s, dir) => {
      val sigs = DedupStages.signatures(pages(s, dir), cfg).cache()
      val (pairs, _) = DedupStages.simhashCandidates(sigs, cfg)
      pairs
        .join(sigs.select(col("doc_id").as("id_a"), col("url").as("ua")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("url").as("ub")), "id_b")
        .select(least(col("ua"), col("ub")).as("url_a"),
          greatest(col("ua"), col("ub")).as("url_b"))
    }),

    "q_near_dup_pairs" -> ((s, dir) =>
      pipe(s, dir).verifiedPairs.select(
        col("url_a"), col("url_b"),
        floor(col("jaccard") * 1000).cast("long").as("jac_permille"))),

    "q_clusters" -> ((s, dir) =>
      pipe(s, dir).clusters.select("url", "cluster_id")),

    // reference-gated verification: lang equality (format gate,
    // classes/RecordManager.php:1489-1497) + cross-source only
    // (classes/RecordManager.php:1346)
    "q_near_dup_gated" -> ((s, dir) => {
      val gated = cfg.copy(requireSameLang = true, crossSourceOnly = true)
      val side = pipe(s, dir).signatures.select("doc_id", "url", "source", "lang")
        .join(pages(s, dir).select("url", "text"), Seq("url"))
      DedupStages.verified(pipe(s, dir).candidatePairs, side, gated)
        .select(col("url_a"), col("url_b"),
          floor(col("jaccard") * 1000).cast("long").as("jac_permille"))
    }),

    "q_merged_clusters" -> ((s, dir) =>
      pipe(s, dir).merged.select(
        col("cluster_id"), col("size"), col("members"),
        col("rep_url"), col("langs"), col("sources"))),

    // ------------------------- projection/set-op/window extras (SURVEY §2)
    // export sampling: every Nth record in stream order
    // (classes/RecordManager.php:331-333)
    "q_export_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      docs(s, dir)
        .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
        .where(col("rn") % 7 === 0).select("doc_id", "source")
    }),

    // value mapping with ##default (classes/SolrUpdater.php:990-1014)
    "q_value_map" -> ((s, dir) => {
      val m = typedLit(Map("en" -> "eng", "de" -> "ger", "fr" -> "fre"))
      docs(s, dir).select(col("doc_id"),
        coalesce(element_at(m, col("lang")), lit("other")).as("lang_mapped"))
    }),

    // allfields synthesis: distinct sorted tokens re-joined
    // (classes/MarcRecord.php:1917-1948; classes/SolrUpdater.php:1078-1091)
    "q_allfields" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
          .as("allfields"))),

    // case-insensitive first-wins unique (MetadataUtils::array_iunique,
    // classes/MetadataUtils.php:288-298)
    "q_iunique" -> ((s, dir) => {
      val arr = array(col("lang"), upper(col("lang")), col("source"), upper(col("source")))
      docs(s, dir).select(col("doc_id"),
        filter(arr, (x, i) =>
          !exists(slice(arr, lit(1), i), y => lower(y) === lower(x))).as("iunique"))
    }),

    // from/until window + pagination (classes/OaiPmhProvider.php:218-261)
    "q_until_window" -> ((s, dir) =>
      events(s, dir)
        .where(col("ts").cast("timestamp").between(
          lit("2024-01-02 00:00:00").cast("timestamp"),
          lit("2024-06-01 00:00:00").cast("timestamp")))
        .orderBy(col("ts"), col("event_id"))
        .select(col("event_id"), col("event_type"))
        .limit(25)),

    // reference Levenshtein verification (classes/RecordManager.php:
    // 1583-1590: lev over first 255 units / length of the FIRST side *
    // 100, reject >= 10) applied on top of the verified near-dup pairs
    "q_lev_pairs" -> ((s, dir) => {
      val nrm = pages(s, dir).select(col("url"),
        normalizeText(col("text")).as("nrm"))
      val lev = levenshtein(
        substring(col("nrm_a"), 1, 255), substring(col("nrm_b"), 1, 255))
      pipe(s, dir).verifiedPairs
        .join(nrm.select(col("url").as("url_a"), col("nrm").as("nrm_a")), "url_a")
        .join(nrm.select(col("url").as("url_b"), col("nrm").as("nrm_b")), "url_b")
        .withColumn("lev_pct", floor(lev * lit(100.0) / length(col("nrm_a"))))
        .where(lev * lit(100.0) / length(col("nrm_a")) < 10)
        .select(col("url_a"), col("url_b"), col("lev_pct").cast("long").as("lev_pct"))
    }),

    // --------------------------------------------- similarity search (ANN)
    // embedding-cosine near-duplicate channel: SRP-LSH bucket join +
    // exact cosine rerank at the near-dup threshold (the scale path —
    // no cross join; bucket collisions are the candidate generator)
    "q_embedding_dups" -> ((s, dir) =>
      Similarity.cosineDupPairs(embeddings(s, dir), threshold = 0.95)),

    "q_knn_brute" -> ((s, dir) =>
      Similarity.knnBrute(embeddings(s, dir))),

    "q_knn_lsh" -> ((s, dir) =>
      Similarity.knnLsh(embeddings(s, dir))),

    "q_embedding_dims" -> ((s, dir) =>
      embeddings(s, dir).select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"), col("label"))),

    // --------------------------------------------------------- text analysis
    "q_lang_id" -> ((s, dir) =>
      TextStats.langId(docs(s, dir))),

    "q_fingerprints" -> ((s, dir) =>
      TextStats.fingerprints(docs(s, dir)))
  )

  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q_pages" ->
      s"""SELECT $urlSql AS url,
         |strftime(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) HOUR, '%Y-%m-%d %H:%M:%S') AS warc_ts_str,
         |text, lang, source FROM documents""".stripMargin,

    "q_normalize" ->
      s"SELECT doc_id, ${normSql.format("text")} AS norm_text FROM documents",

    "q_title_key" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id, w, i, length(w[i]) AS wl FROM d, UNNEST(range(1, len(w) + 1)) AS t(i)),
         |s AS (SELECT doc_id, w, i,
         |  sum(wl) OVER (PARTITION BY doc_id ORDER BY i) AS keylen,
         |  sum(CASE WHEN wl > 3 THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY i) AS longw
         |  FROM p),
         |c AS (SELECT doc_id, coalesce(min(CASE WHEN longw > 3 OR keylen > 35 THEN i END), max(i)) AS ci
         |  FROM s GROUP BY doc_id)
         |SELECT d.doc_id, ${normSql.format("array_to_string(d.w[1:c.ci], '')")} AS title_key
         |FROM d JOIN c ON d.doc_id = c.doc_id""".stripMargin,

    "q_content_hash" ->
      "SELECT doc_id, md5(text) AS content_hash FROM documents",

    "q_media_meta" ->
      s"""SELECT $urlSql AS url,
         |octet_length(encode('<html><body>' || text || '</body></html>')) AS byte_length,
         |lower(hex(encode(substring('<html><body>' || text || '</body></html>', 1, 4)))) AS magic_hex
         |FROM documents""".stripMargin,

    "q_id_sort_key" ->
      s"""SELECT $urlSql AS url, regexp_extract($urlSql, '(\\d+)$$', 1) AS sort_key FROM documents""",

    "q_isbn13" ->
      """WITH i AS (SELECT doc_id, lpad(CAST(doc_id AS VARCHAR), 9, '0') AS p FROM documents),
        |s AS (SELECT doc_id, p,
        |  38 + 3 * (CAST(p[1] AS INT) + CAST(p[3] AS INT) + CAST(p[5] AS INT) + CAST(p[7] AS INT) + CAST(p[9] AS INT))
        |     + CAST(p[2] AS INT) + CAST(p[4] AS INT) + CAST(p[6] AS INT) + CAST(p[8] AS INT) AS tot
        |  FROM i)
        |SELECT doc_id, '978' || p || CAST((10 - (tot % 10)) % 10 AS VARCHAR) AS isbn13 FROM s""".stripMargin,

    "q_hier_facet" ->
      """SELECT doc_id, ['0/' || source || '/', '1/' || source || '/' || lang || '/'] AS facets
        |FROM documents""".stripMargin,

    "q_watermark" ->
      """SELECT source, count(*) AS n FROM documents
        |WHERE TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) HOUR >= TIMESTAMP '2024-01-11 00:00:00'
        |GROUP BY source""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
        |new AS (SELECT doc_id, md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 97 <> 0)
        |SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |  CASE WHEN new.doc_id IS NULL THEN 'deleted'
        |       WHEN old.h <> new.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id""".stripMargin,

    "q_mark_sweep" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents s WHERE s.doc_id % 7 <> 0 AND s.doc_id = d.doc_id)""".stripMargin,

    "q_events_page" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events
        |ORDER BY ts, event_id LIMIT 50 OFFSET 100""".stripMargin,

    "q_vocab" ->
      """SELECT t.token AS token, count(*) AS n
        |FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        |WHERE t.token <> '' GROUP BY t.token""".stripMargin,

    "q_lang_counts" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang",

    "q_source_lang" ->
      "SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang",

    "q_longest_per_source" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "q_quality" ->
      """SELECT doc_id,
        |length(text) AS char_count,
        |len(string_split(text, ' ')) AS word_count,
        |len(list_distinct(string_split(text, ' '))) AS distinct_words,
        |len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','to'], x))) AS stopword_count,
        |CAST(floor(1000.0 * len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))) AS BIGINT) AS distinct_permille
        |FROM documents""".stripMargin,

    "q_exact_dup_pairs" ->
      s"""WITH p AS (SELECT $urlSql AS url, md5(text) AS h FROM documents)
         |SELECT a.url AS url_a, b.url AS url_b FROM p a JOIN p b ON a.h = b.h AND a.url < b.url""".stripMargin,

    "q_exact_clusters" ->
      s"""WITH p AS (SELECT $urlSql AS url, md5(text) AS h FROM documents),
         |g AS (SELECT h, min(url) AS cluster_id, count(*) AS c FROM p GROUP BY h)
         |SELECT p.url, g.cluster_id FROM p JOIN g ON p.h = g.h WHERE g.c > 1""".stripMargin,

    "q_near_dup_pairs" ->
      s"""WITH $shingleCte
         |SELECT url_a, url_b, CAST(floor((i * 1.0 / u) * 1000) AS BIGINT) AS jac_permille
         |FROM jp WHERE i * 1.0 / u >= ${cfg.jaccardThreshold}
         |   OR i * 1.0 / mn >= ${cfg.containmentThreshold}""".stripMargin,

    "q_near_dup_gated" ->
      s"""WITH $shingleCte
         |SELECT url_a, url_b, CAST(floor((i * 1.0 / u) * 1000) AS BIGINT) AS jac_permille
         |FROM jp WHERE (i * 1.0 / u >= ${cfg.jaccardThreshold}
         |   OR i * 1.0 / mn >= ${cfg.containmentThreshold})
         |  AND same_lang AND cross_src""".stripMargin,

    "q_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |e AS (SELECT url_a AS u, url_b AS v FROM jp WHERE i * 1.0 / u >= ${cfg.jaccardThreshold}
         |   OR i * 1.0 / mn >= ${cfg.containmentThreshold}),
         |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
         |reach(a, b) AS (SELECT u, v FROM sym
         |  UNION SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u WHERE r.a <> s.v)
         |SELECT a AS url, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin,

    "q_merged_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |e AS (SELECT url_a AS u, url_b AS v FROM jp WHERE i * 1.0 / u >= ${cfg.jaccardThreshold}
         |   OR i * 1.0 / mn >= ${cfg.containmentThreshold}),
         |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
         |reach(a, b) AS (SELECT u, v FROM sym
         |  UNION SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u WHERE r.a <> s.v),
         |cl AS (SELECT a AS url, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
         |m AS (SELECT cl.cluster_id, cl.url, sh.text, sh.lang, sh.source,
         |  row_number() OVER (PARTITION BY cl.cluster_id ORDER BY length(sh.text) DESC, cl.url) AS rn
         |  FROM cl JOIN sh ON cl.url = sh.url)
         |SELECT cluster_id, count(*) AS size, list_sort(list(url)) AS members,
         |  max(CASE WHEN rn = 1 THEN url END) AS rep_url,
         |  list_sort(list(DISTINCT lang)) AS langs,
         |  list_sort(list(DISTINCT source)) AS sources
         |FROM m GROUP BY cluster_id""".stripMargin,

    "q_export_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (ORDER BY doc_id) AS rn FROM documents)
        |WHERE rn % 7 = 0""".stripMargin,

    "q_value_map" ->
      """SELECT doc_id, CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'ger'
        |  WHEN 'fr' THEN 'fre' ELSE 'other' END AS lang_mapped FROM documents""".stripMargin,

    "q_allfields" ->
      """SELECT doc_id, array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
        |  AS allfields FROM documents""".stripMargin,

    "q_iunique" ->
      "SELECT doc_id, [lang, source] AS iunique FROM documents",

    "q_until_window" ->
      """SELECT event_id, event_type FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' AND TIMESTAMP '2024-06-01 00:00:00'
        |ORDER BY ts, event_id LIMIT 25""".stripMargin,

    "q_lev_pairs" ->
      s"""WITH $shingleCte,
         |nd AS (SELECT url, ${normSql.format("text")} AS nrm FROM d)
         |SELECT jp.url_a, jp.url_b,
         |  CAST(floor(levenshtein(substr(a.nrm, 1, 255), substr(b.nrm, 1, 255)) * 100.0 / length(a.nrm)) AS BIGINT) AS lev_pct
         |FROM jp JOIN nd a ON jp.url_a = a.url JOIN nd b ON jp.url_b = b.url
         |WHERE (i * 1.0 / u >= ${cfg.jaccardThreshold} OR i * 1.0 / mn >= ${cfg.containmentThreshold})
         |  AND levenshtein(substr(a.nrm, 1, 255), substr(b.nrm, 1, 255)) * 100.0 / length(a.nrm) < 10""".stripMargin,

    "q_embedding_dups" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""".stripMargin,

    "q_embedding_dims" ->
      "SELECT vec_id, len(embedding) AS dim, label FROM embeddings"
  )
}
