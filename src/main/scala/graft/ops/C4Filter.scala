package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style line-level cleaning (Raffel et al., "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
 * §2.2): the classic web-text pass that keeps only lines that look like
 * prose sentences and drops whole pages that look like boilerplate or
 * code. Complements the document-level Gopher gate
 * (`TextStats.qualityGate`) and the paragraph-granularity dedup
 * (`ParagraphOps`): C4's distinctive contribution is per-LINE retention.
 *
 * Rules (public-paper semantics, re-expressed as codegen'd Spark
 * builtins — per-row higher-order functions only, no shuffle, no UDF):
 *  - keep a line only if it ends in terminal punctuation (. ! ? or a
 *    closing double quote), has at least `minLineWords` whitespace
 *    words, and does not mention "javascript" (case-insensitive);
 *  - a page passes only if it retains at least `minKeptLines` lines,
 *    contains none of `badPhrases` (case-insensitive; C4 used
 *    "lorem ipsum" plus a large blocklist we leave to the caller), and
 *    contains no '{' (code marker).
 *
 * C4's original formulation gates pages on "fewer than 3 sentences";
 * kept lines are exactly the sentence-shaped units here, so the
 * kept-line count is the line-level restatement of that rule.
 *
 * Output: (doc_id, n_lines, n_kept, pass, cleaned) — `cleaned` is the
 * kept lines re-joined with '\n' (emitted for failing pages too, so the
 * caller chooses between `where(pass === 1)` page filtering and
 * line-only cleaning). All columns scalar; ratios avoided entirely, so
 * a DuckDB oracle replays the rules exactly.
 *
 * Scale notes (100 TB design point): stateless per-row projection —
 * inherits the scan's partitioning, stays inside whole-stage codegen,
 * pushes no shuffle; the bad-phrase list is compiled into the plan as
 * literals (callers with large blocklists should pre-broadcast a
 * lowercase phrase table and semi-join instead).
 */
object C4Filter {

  def c4LineFilter(docs: DataFrame, textCol: String = "text",
                   minLineWords: Long = 5, minKeptLines: Long = 3,
                   badPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val t = col(textCol)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= lit(""))
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(filter(split(l, " "), w => w =!= lit(""))) >= lit(minLineWords) &&
        !lower(l).contains(lit("javascript")))
    val lowerT = lower(t)
    val pageBad = badPhrases.map(p => lowerT.contains(lit(p.toLowerCase)))
      .reduceOption(_ || _).getOrElse(lit(false)) || t.contains(lit("{"))
    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      when(!pageBad && size(kept) >= lit(minKeptLines), 1L).otherwise(0L).as("pass"),
      concat_ws("\n", kept).as("cleaned"))
  }
}
