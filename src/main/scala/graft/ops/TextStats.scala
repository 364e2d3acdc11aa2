package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators a large-scale training-data pipeline needs on
 * top of dedup: language-ID, quality scoring, token counting, document
 * fingerprinting. All composed from codegen'd built-ins (no UDFs); the
 * `countValues` diagnostic mirrors the reference's field-value counter
 * (classes/SolrUpdater.php:704-767).
 */
object TextStats {

  /** Per-language top-stopword tables for the language-ID heuristic —
    * the highest-frequency function words of each language (standard
    * public stopword lists), which is the classic cheap lang-ID signal
    * for whitespace-tokenized text. Deterministic and self-contained;
    * shared words across related languages (de/es/fr/nl/pt all stop on
    * "de") are resolved by the argmax's asc-language-code tie-break,
    * identically in the Spark and DuckDB formulations. Chinese is listed
    * with its character stopwords: it only fires on space-segmented input
    * (the tokenizer contract), otherwise falls through to 'und'. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "una", "que", "en", "de"),
    "it" -> Seq("il", "di", "che", "e", "la", "per", "un", "non"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em"),
    "nl" -> Seq("de", "het", "een", "en", "van", "ik", "dat", "niet"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av"),
    "da" -> Seq("og", "i", "det", "at", "en", "den", "til", "er"),
    "no" -> Seq("og", "i", "det", "på", "som", "en", "er", "til"),
    "fi" -> Seq("ja", "on", "ei", "se", "että", "hän", "oli", "mutta"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "z", "do", "to"),
    "cs" -> Seq("a", "se", "na", "je", "v", "že", "s", "z"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с"),
    "tr" -> Seq("bir", "ve", "bu", "da", "ne", "için", "o", "ile"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini"),
    "vi" -> Seq("là", "và", "của", "có", "không", "được", "một", "người"),
    "ro" -> Seq("și", "de", "la", "a", "în", "să", "nu", "cu"),
    "hu" -> Seq("a", "az", "és", "hogy", "nem", "is", "egy", "van"),
    "zh" -> Seq("的", "是", "不", "了", "在", "我", "有", "他"))

  private def tokensCol(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenization; empties excluded). */
  def tokenCount(text: Column): Column =
    size(filter(tokensCol(text), t => t =!= lit("")))

  /** Stopword hits against a fixed marker list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokensCol(text), t => t.isin(stopwords.map(lit): _*)))

  /** BPE-ish pre-tokenizer pattern (GPT-2 style, simplified to what both
    * Java regex and RE2 support — no lookahead): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. Splitting
    * a doc with it approximates subword-tokenizer input segmentation, so
    * its match count is the standard cheap proxy for LLM token count. */
  val bpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** BPE-ish token count: number of pre-tokenizer segments (codegen'd
    * regexp_extract_all, no UDF). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Quality features, all integer-valued for oracle-stable comparison:
    * char count, word count, distinct-word count, stopword count, and
    * distinct/total ratio in permille. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokensCol(t)
    docs.select(
      col("doc_id"),
      length(t).as("char_count"),
      size(toks).as("word_count"),
      size(array_distinct(toks)).as("distinct_words"),
      stopwordCount(t, langMarkers("en")).as("stopword_count"),
      floor(lit(1000.0) * size(array_distinct(toks)) / size(toks)).cast("long")
        .as("distinct_permille"))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" — public paper): rank every document WITHIN its language by a
    * quality score and cut the ranking into `buckets` equal-depth bands —
    * CCNet's head/middle/tail thirds, which downstream training mixes
    * sample at different rates. CCNet scores with a per-language LM's
    * perplexity; the container ships no LM, so the score here is the
    * integer lexical-diversity permille from `qualityFeatures` (disclosed
    * stand-in — swap `scoreOf` for a model score column when one exists).
    * The portable part is the mechanism: a TOTAL deterministic order
    * (score desc, doc_id asc — no ties left to the engine) + standard SQL
    * NTILE, so any engine replays the exact same buckets.
    *
    * Output: (doc_id, lang, score, bucket) with bucket in 1..`buckets`
    * (1 = head). Scale shape: one shuffle, partitioned by lang. At 10^12
    * docs the big languages skew a lang-partitioned window; the same
    * equal-depth contract then comes from a two-pass cut — aggregate a
    * per-lang quantile sketch (`percentile_approx`), broadcast the cut
    * points, assign buckets map-side — with only the tiny sketch agg
    * shuffling. The window form is the exact-semantics spec the sketch
    * path is tested against. */
  def qualityBuckets(docs: DataFrame, buckets: Int = 3,
                     textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("lang"),
      floor(lit(1000.0) * size(array_distinct(tokensCol(col(textCol)))) /
        size(tokensCol(col(textCol)))).cast("long").as("score"))
    scored.withColumn("bucket", ntile(buckets).over(
        Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id").asc))
      .cast("long"))
  }

  /** The sketch-path materialization of `qualityBuckets` — what actually
    * runs when a language no longer fits one window partition: pass 1
    * aggregates a per-language quantile sketch (`percentile_approx`, a
    * few KB per language), pass 2 assigns buckets MAP-SIDE against the
    * broadcast cut points — only the tiny sketch agg shuffles, never the
    * corpus. Two deviations from the exact window form, both inherent to
    * cut-point bucketing (this is CCNet's own formulation — fixed
    * perplexity cut points, not a rank): tied scores land in ONE bucket
    * (ntile splits ties to equalize depth), and depth is equal only to
    * sketch accuracy and boundary rounding. TextStatsSpec pins the
    * sketch path's contract — score-monotone buckets, near-equal depth
    * on tie-free data, ties co-bucketed — next to the exact window
    * form. */
  def qualityBucketsSketch(docs: DataFrame, buckets: Int = 3,
                           textCol: String = "text",
                           accuracy: Int = 10000): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val scored = docs.select(col("doc_id"), col("lang"),
      floor(lit(1000.0) * size(array_distinct(tokensCol(col(textCol)))) /
        size(tokensCol(col(textCol)))).cast("long").as("score"))
    // quantiles of DESCENDING rank = ascending (1-q) quantiles of score:
    // bucket b covers scores in (cut_b, cut_{b-1}]; bucket 1 = head
    val qs = (1 until buckets).map(i => 1.0 - i.toDouble / buckets)
    val cuts = scored.groupBy("lang")
      .agg(percentile_approx(col("score"), typedLit(qs), lit(accuracy)).as("cuts"))
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        (lit(1) + aggregate(col("cuts"), lit(0),
          (acc, cut) => acc + when(col("score") <= cut, 1).otherwise(0)))
        .cast("long"))
      .select("doc_id", "lang", "score", "bucket")
  }

  /** Stopwords the Gopher quality gate requires ≥2 distinct hits of
    * (Rae et al. 2021, MassiveText filtering — public paper). */
  val gateStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style composite document quality gate (MassiveText rules,
    * Rae et al. 2021 §A.1.1 — public paper; original Spark formulation).
    * Emits per-doc counters, a pass bit, and the sorted comma-joined
    * tags of every failed rule, so a cleaning pass can both filter and
    * attribute its losses. Rules:
    *   word_count     — `minWords ≤ n_words ≤ maxWords`
    *   mean_word_len  — mean word length in [3, 10] chars
    *   symbol_ratio   — (# + "...") occurrences ≤ 0.1 × words
    *   bullet_lines   — ≤ 90% of lines start with a bullet
    *   ellipsis_lines — ≤ 30% of lines end with "..."/"…"
    *   alpha_words    — ≥ 80% of words contain an alphabetic char
    *                    ([A-Za-z]; ASCII-corpus contract, like the
    *                    whitespace tokenizer above)
    *   stopwords      — ≥ 2 distinct `gateStopwords` hits
    * All ratio comparisons are integer cross-multiplications (e.g.
    * `10·symbols ≤ words`), never floats, so the DuckDB oracle replays
    * them exactly. Lines are ASCII-space-trimmed (Spark/DuckDB `trim`
    * semantics — tabs do NOT blank a line). Per-row HOFs only — no
    * shuffle, no UDF, stays inside whole-stage codegen. */
  def qualityGate(docs: DataFrame, textCol: String = "text",
                  minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val t = col(textCol)
    val words = filter(split(translate(t, "\n", " "), " "), w => w =!= lit(""))
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= lit(""))
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val sumWordLen = aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
    val hashCount = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipsisCount = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
      + (length(t) - length(regexp_replace(t, "…", "")))).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_distinct(filter(words,
      w => w.isin(gateStopwords.map(lit): _*)))).cast("long")

    // (tag, pass) in tag-sorted order so fail_reasons needs no re-sort
    val rules: Seq[(String, Column)] = Seq(
      "alpha_words" -> (alphaWords * 5 >= nWords * 4),
      "bullet_lines" -> (bulletLines * 10 <= nLines * 9),
      "ellipsis_lines" -> (ellipsisLines * 10 <= nLines * 3),
      "mean_word_len" -> (sumWordLen >= nWords * 3 && sumWordLen <= nWords * 10),
      "stopwords" -> (stopHits >= 2),
      "symbol_ratio" -> ((hashCount + ellipsisCount) * 10 <= nWords),
      "word_count" -> (nWords >= minWords && nWords <= maxWords))
    val failed = filter(
      array(rules.map { case (tag, ok) => when(!ok, lit(tag)) }: _*),
      x => x.isNotNull)
    docs.select(col("doc_id"), nWords.as("n_words"), nLines.as("n_lines"),
      when(size(failed) === 0, 1L).otherwise(0L).as("pass"),
      array_join(failed, ",").as("fail_reasons"))
  }

  /** Language-ID: argmax of marker-hit counts, ties broken by language
    * code order, fallback "und" when no marker hits. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordCount(t, words).as("hits"),
        // invert code for max() tie-break = first alphabetically
        lit(lang).as("lang"))
    }
    // max by hits; on equal hits array_max picks greater lang code — make
    // deterministic-first by sorting with a desc-hits, asc-lang key
    val best = array_sort(array(scored: _*),
      (l, r) => when(l.getField("hits") > r.getField("hits"), -1)
        .when(l.getField("hits") < r.getField("hits"), 1)
        .when(l.getField("lang") < r.getField("lang"), -1)
        .when(l.getField("lang") > r.getField("lang"), 1)
        .otherwise(0)).getItem(0)
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
      when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("predicted_lang"))
  }

  /** Document fingerprint: 64-bit content hash of the exact text plus a
    * shingle-set sketch hash (order-independent), for cheap
    * change-detection joins (the reference's `content_hash` role,
    * classes/RecordManager.php:1059-1066). */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.TextColumns
    docs.select(
      col("doc_id"),
      xxhash64(col(textCol)).as("text_hash"),
      aggregate(TextColumns.shingleSet(col(textCol), 3), lit(0L),
        (acc, x) => acc.bitwiseXOR(x)).as("shingle_sketch"))
  }

  /** Gopher/MassiveText n-gram repetition statistics (Rae et al. 2021
    * §A.1.1 — public paper; original Spark formulation). For each n in
    * `ns`, over the whitespace token stream of a document:
    *   top{n}_permille — characters covered by occurrences of the single
    *     MOST FREQUENT n-gram, as a permille of characters covered by all
    *     n-gram occurrences (Gopher's "fraction of characters in the most
    *     common n-gram", thresholds 0.20/0.18/0.16 for n=2/3/4). Count
    *     ties break to the lexicographically smallest gram.
    *   dup{n}_permille — characters covered by occurrences of n-grams
    *     that appear ≥2 times, same denominator (Gopher's "fraction of
    *     characters in duplicate n-grams", thresholds 0.15…0.10 for
    *     n=5…10).
    * An n-gram's character length counts its joining spaces (the gram as
    * a string); a doc with fewer than n tokens reports 0/0 → 0‰. Both
    * ratios use the repo-standard `floor(1000.0·x/y)` permille so the
    * DuckDB oracle replays them exactly.
    *
    * Scale notes: per-row only — sort the gram array once (O(L log L))
    * and fold it in ONE `aggregate` pass that run-length-scans equal
    * neighbours (no per-gram `filter` rescans, which would be O(L²) on
    * long documents). No shuffle, no UDF; stays in whole-stage codegen. */
  def ngramRepetition(docs: DataFrame, textCol: String = "text",
                      ns: Seq[Int] = Seq(2, 5)): DataFrame = {
    val toks = filter(tokensCol(col(textCol)), t => t =!= lit(""))
    val statCols = ns.flatMap { n =>
      // sequence(0, k) counts DOWN when k<0 — short docs need the guard
      val grams = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      // one-pass run-length fold over the sorted gram array:
      // (prev gram, current run, Σ occurrence chars, Σ duplicate-run
      //  chars, best run count, best run chars)
      val init = struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("totc"), lit(0L).as("dupc"),
        lit(0L).as("bestn"), lit(0L).as("bestc"))
      def flushed(acc: Column): (Column, Column, Column) = {
        val runChars = acc("run") * length(acc("prev"))
        val dupc = when(acc("run") >= 2, acc("dupc") + runChars)
          .otherwise(acc("dupc"))
        // strict > keeps the FIRST (lexicographically smallest) gram on
        // count ties — the sorted order makes this deterministic
        val better = acc("run") > acc("bestn")
        (dupc, when(better, acc("run")).otherwise(acc("bestn")),
          when(better, runChars).otherwise(acc("bestc")))
      }
      val folded = aggregate(
        array_sort(grams), init,
        (acc, g) => {
          val same = g === acc("prev")
          val (dupc, bestn, bestc) = flushed(acc)
          struct(g.as("prev"),
            when(same, acc("run") + 1).otherwise(lit(1L)).as("run"),
            (acc("totc") + length(g)).as("totc"),
            when(same, acc("dupc")).otherwise(dupc).as("dupc"),
            when(same, acc("bestn")).otherwise(bestn).as("bestn"),
            when(same, acc("bestc")).otherwise(bestc).as("bestc"))
        },
        acc => {
          val (dupc, _, bestc) = flushed(acc) // flush the final run
          struct(acc("totc").as("totc"), dupc.as("dupc"), bestc.as("bestc"))
        })
      def permille(x: Column): Column =
        when(folded("totc") > 0, floor(lit(1000.0) * x / folded("totc")))
          .otherwise(lit(0)).cast("long")
      Seq(permille(folded("bestc")).as(s"top${n}_permille"),
        permille(folded("dupc")).as(s"dup${n}_permille"))
    }
    docs.select(col("doc_id") +: statCols: _*)
  }

  /** `countValues` analog: token frequency across the corpus, descending. */
  def vocabCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))

  /** Corpus-frequency rare-token stats: per doc, how much of its token
    * mass is tokens the whole corpus has seen ≤ `rareMaxCount` times —
    * the cross-document statistical garbage detector (OCR noise, hash
    * soup, encoding damage score high) that complements the per-doc
    * heuristic gates; the containerless stand-in for a CCNet-style
    * perplexity tier (no external LM in this environment, disclosed).
    *
    * Integer-exact output (`rare_permille` by cross-multiplication) so
    * the DuckDB oracle replays it with zero float drift.
    *
    * Scale shape: the rare VOCAB is huge in types (Zipf: ~half of all
    * types are hapax) but each row is one narrow token string — the doc
    * side joins it with a left-semi on the token key (shuffle carries
    * (id, token) pairs only for rare hits after the semi-join's runtime
    * filter; common tokens — the bulk of occurrences — never ride it).
    * Two token-keyed shuffles + one id-keyed count; nothing is
    * driver-side, nothing is all-pairs. */
  def rareTokenStats(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", rareMaxCount: Long = 1): DataFrame = {
    require(rareMaxCount >= 1, s"rareMaxCount must be >= 1, got $rareMaxCount")
    val occ = docs.select(col(idCol),
        explode(filter(tokensCol(col(textCol)), t => t =!= lit(""))).as("tok"))
    val rareVocab = occ.groupBy("tok").agg(count(lit(1)).as("n"))
      .where(col("n") <= rareMaxCount).select("tok")
    val rarePerDoc = occ.join(rareVocab, Seq("tok"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_rare"))
    docs.select(col(idCol), tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(rarePerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(col("n_tokens") > 0,
          floor(coalesce(col("n_rare"), lit(0L)) * 1000 / col("n_tokens")))
          .otherwise(lit(0L)).cast("long").as("rare_permille"))
  }

  /** Quantized unigram-LM surprisal per document — the CCNet-style
    * perplexity tier (Wenzek et al., LREC'20) made integer-exact so the
    * cross-engine oracle replays it with zero float drift: each token's
    * surprisal -log2(count/total) is quantized to the integer bucket
    * `floor(log2(total)) - floor(log2(count))`, computed EXACTLY in both
    * engines as `length(bin(n)) - 1` (bit-length, no libm). The per-doc
    * output is the occurrence-weighted sum and its mean in millibits —
    * high mean = rare-token-heavy text (OCR noise, hash soup, tag soup),
    * low mean = stopword-heavy boilerplate; CCNet buckets on exactly
    * this axis (keep the middle, flag both tails).
    *
    * Scale shape: occurrences are pre-aggregated to (doc, token, count)
    * with map-side combine BEFORE the vocab join, so the token-keyed
    * shuffle carries distinct (doc,token) pairs, not raw occurrences;
    * the vocab side is types-not-tokens (Zipf-small relative to the
    * corpus) and AQE broadcast-converts it when it fits. Two token-keyed
    * shuffles + one id-keyed agg; the 1-row corpus total rides a
    * broadcast nested-loop join (scalar literal at runtime). Nothing is
    * driver-side, nothing is all-pairs. */
  def unigramSurprisal(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val perDocTok = docs.select(col(idCol),
        explode(filter(tokensCol(col(textCol)), t => t =!= lit(""))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val vocab = perDocTok.groupBy("tok").agg(sum("c").as("n"))
    // floor(log2(n)) == bit_length(n) - 1, exact in Spark and DuckDB
    val lgVocab = vocab.select(col("tok"), (length(bin(col("n"))) - 1).as("lg_n"))
    val lgTotal = vocab.agg((length(bin(sum(col("n")))) - 1).as("lg_t"))
    perDocTok.join(lgVocab, Seq("tok")).crossJoin(lgTotal)
      .groupBy(col(idCol))
      .agg(sum("c").cast("long").as("n_tokens"),
        sum(col("c") * (col("lg_t") - col("lg_n"))).cast("long")
          .as("surprisal_bits"))
      .select(col(idCol), col("n_tokens"), col("surprisal_bits"),
        floor(col("surprisal_bits") * 1000 / col("n_tokens"))
          .cast("long").as("mean_millibits"))
  }
}
