package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination: tag corpus documents whose text shares word
  * n-grams with a benchmark/eval snippet set, the standard guard against
  * test-set leakage when assembling LLM training data (n-gram collision
  * decontamination as published for GPT-3, Appendix C of Brown et al.
  * 2020, and open reproductions — public method; original Spark
  * formulation).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - The eval side is tiny by construction (benchmark suites are at
  *     most millions of n-grams); its distinct gram set is BROADCAST, so
  *     corpus-side grams are probed map-side and never shuffle.
  *   - Corpus n-grams are deduped per doc inside the row (array_distinct
  *     before explode), so the only shuffle is the final per-doc count —
  *     and only for docs with ≥1 hit (inner join drops the clean ones
  *     before the aggregate; they re-enter via the cheap left join on the
  *     narrow id projection).
  *   - Grams ride as 32-char md5 hex of the joined tokens, not the token
  *     text itself: fixed-width keys, no long-document blowup. (xxhash64
  *     would halve that again but is not replayable by the DuckDB
  *     oracle; the swap is a one-line change at deployment.)
  * Everything is per-row HOFs + one broadcast hash join — no UDF, stays
  * inside whole-stage codegen.
  */
object Decontaminate {

  /** Distinct md5 hashes of the text's word n-grams. Tokenization is the
    * corpus-wide convention (single-space split, empties dropped —
    * matches TextStats). Texts with fewer than n tokens yield no grams. */
  def ngramHashes(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val toks = filter(split(text, " "), t => t =!= lit(""))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => md5(concat_ws(" ", slice(toks, i, lit(n)))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document contamination stats against an eval snippet set:
    * (idCol, eval_ngram_hits = distinct shared n-grams, contaminated =
    * hits ≥ minHits). Every corpus row appears exactly once (clean docs
    * carry hits = 0).
    *
    * `corpus` and `evalTexts` must be INDEPENDENT plans when they derive
    * from the same file source (pass each its own spark.read) — sharing
    * one uncached val across two HOF-bearing derivations trips Spark's
    * self-join dedup on lambda variables (INTERNAL_ERROR_ATTRIBUTE_NOT_
    * FOUND; same caveat as Similarity.knnIvf). */
  def overlap(corpus: DataFrame, evalTexts: DataFrame, n: Int = 8,
              minHits: Long = 1, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val evalGrams = evalTexts
      .select(explode(ngramHashes(col(textCol), n)).as("g"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(ngramHashes(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy(idCol).agg(count(lit(1)).as("eval_ngram_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("eval_ngram_hits"), lit(0L)).as("eval_ngram_hits"))
      .withColumn("contaminated", col("eval_ngram_hits") >= minHits)
  }
}
