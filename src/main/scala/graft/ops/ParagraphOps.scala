package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sub-document dedup and repetition operators for web-text training
 * pipelines. Document-level dedup misses the dominant web noise source:
 * boilerplate (nav bars, footers, cookie banners) repeated across pages
 * and template repetition within a page. Production pipelines therefore
 * dedup at PARAGRAPH granularity across the corpus (CCNet's per-shard
 * paragraph dedup, RefinedWeb's exact-substring pass) and score
 * within-document repetition as a quality gate (Gopher/MassiveText's
 * duplicate-line and duplicate-line-character fractions). These are the
 * public-paper references; the implementations below are original
 * Spark-first formulations.
 *
 * Scale notes (100 TB design point):
 *  - `paragraphs` explodes each doc into (doc_id, pos, par) rows; every
 *    downstream shuffle carries (doc_id, pos, 32-byte md5) — paragraph
 *    TEXT crosses a shuffle only in `dedupParagraphs`, which must
 *    re-emit surviving text. A production deployment would swap the
 *    md5 used here (chosen because the DuckDB oracle can replay it) for
 *    `xxhash64` — 8-byte keys — via the `hash` parameter.
 *  - occurrence counting is a hash-partitioned groupBy with map-side
 *    partial aggregation; first-occurrence selection is min(struct)
 *    aggregation — also partially aggregatable — NOT a window sort, so
 *    a cookie-banner paragraph with 10^8 occurrences costs a skewed
 *    reduce partition but never an O(n log n) per-key sort; AQE
 *    skew-join splitting applies to the join back.
 *  - `lineRepetitionStats` is per-row higher-order functions only: no
 *    shuffle, no UDF, stays inside whole-stage codegen.
 */
object ParagraphOps {

  /** (doc_id, pos, par): non-empty trimmed paragraphs in document order.
    * Paragraph boundary is the blank line ("\n\n"); `pos` is the
    * paragraph's 0-based index BEFORE empty-paragraph filtering, so it
    * remains a stable document-order key. */
  def paragraphs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        posexplode(transform(split(col(textCol), "\n\n"), p => trim(p))))
      .toDF("doc_id", "pos", "par")
      .where(col("par") =!= "")

  /** Per-doc cross-corpus paragraph duplication stats: total paragraphs
    * and how many have >1 occurrence anywhere in the corpus (the CCNet
    * shard-dedup decision signal). Output: (doc_id, n_pars, n_dup_pars). */
  def paragraphDupStats(docs: DataFrame, textCol: String = "text",
                        hash: Column => Column = md5): DataFrame = {
    val pars = paragraphs(docs, textCol).select(col("doc_id"), hash(col("par")).as("ph"))
    val counts = pars.groupBy("ph").agg(count(lit(1)).as("n_occ"))
    // join back on the same key the aggregation shuffled on: AQE
    // co-partitions both sides, no extra exchange for `pars`
    pars.join(counts, "ph")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pars"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_pars"))
  }

  /** Corpus-wide boilerplate table: hash of every paragraph that occurs
    * at least `minOcc` times, with its occurrence count. The table is
    * the broadcast-able "kill list" a cleaning pass anti-joins against. */
  def boilerplate(docs: DataFrame, textCol: String = "text",
                  minOcc: Long = 2, hash: Column => Column = md5): DataFrame =
    paragraphs(docs, textCol)
      .groupBy(hash(col("par")).as("ph")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= minOcc)

  /** Paragraph-level dedup: keep each distinct paragraph's GLOBAL first
    * occurrence (min (doc_id, pos) over the corpus — deterministic), drop
    * every later occurrence, and re-join the survivors into cleaned
    * per-doc text. A doc whose every paragraph occurred earlier vanishes
    * entirely (exact-clone pages collapse to the first copy). Output:
    * (doc_id, cleaned).
    *
    * First-occurrence selection is a min(struct) aggregation (map-side
    * combinable) rather than a row_number window, so hot boilerplate
    * keys never pay a per-key sort; the per-doc reassembly collect_list
    * is bounded by the doc's own paragraph count. */
  def dedupParagraphs(docs: DataFrame, textCol: String = "text",
                      hash: Column => Column = md5): DataFrame = {
    val pars = paragraphs(docs, textCol).withColumn("ph", hash(col("par")))
    val first = pars.groupBy("ph")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    pars.join(first, "ph")
      .where(struct(col("doc_id"), col("pos")) === col("first"))
      .groupBy("doc_id")
      .agg(concat_ws("\n\n",
        transform(array_sort(collect_list(struct(col("pos"), col("par")))),
          _.getField("par"))).as("cleaned"))
  }

  /** Within-doc repetition stats (Gopher/MassiveText quality-filter
    * signals), integer permille for oracle-stable comparison:
    * duplicate-line fraction and duplicate-line CHARACTER fraction
    * (chars inside lines whose content occurs more than once in the
    * doc, over all line chars). Lines are trimmed, empties dropped.
    * Docs with no lines emit zeros. Per-row HOFs only — no shuffle. */
  def lineRepetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => l =!= lit(""))
    val nLines = size(lines).cast("long")
    val nDistinct = size(array_distinct(lines)).cast("long")
    val dupChars = aggregate(lines, lit(0L), (acc, l) =>
      acc + when(size(filter(lines, x => x === l)) > 1, length(l).cast("long"))
        .otherwise(0L))
    val totChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l).cast("long"))
    docs.select(col("doc_id"),
      nLines.as("n_lines"),
      nDistinct.as("n_distinct_lines"),
      when(nLines > 0, floor(lit(1000.0) * (nLines - nDistinct) / nLines))
        .otherwise(0L).cast("long").as("dup_line_permille"),
      when(totChars > 0, floor(lit(1000.0) * dupChars / totChars))
        .otherwise(0L).cast("long").as("dup_char_permille"))
  }
}
