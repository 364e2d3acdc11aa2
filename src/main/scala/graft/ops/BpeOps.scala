package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-merge learning (Sennrich et al., ACL 2016) — the
  * vocabulary-training half of the tokenizer a training-data pipeline
  * feeds; the counting half (`TextStats.tokenStats`) already ships.
  *
  * Scale shape: the corpus is reduced ONCE to a (word, freq) table — the
  * compact representation every BPE round runs over (at 10^12 web docs
  * the distinct-word table is ~10^8–10^9 rows, its pair-count table far
  * smaller). Each merge round is then one map-side-combinable groupBy
  * over that table + a 1-row argmax collect + a distributed column
  * rewrite; the raw corpus is never re-read after round 0. The per-round
  * table is re-materialized (`localCheckpoint`) so the plan stays O(1)
  * per round instead of nesting k `aggregate` folds — the same lineage
  * discipline as `ConnectedComponents`.
  *
  * Symbol granularity is UTF-16 code units (Spark's `split(w, "")`),
  * word-final symbols carry the standard `</w>` marker, and words are
  * counted case-sensitively (no locale-dependent lowercasing in the
  * contract). Tie-breaks are total: (count desc, left asc, right asc) —
  * the learned merge list is deterministic on any cluster size.
  */
object BpeOps {

  val EndMark = "</w>"

  /** Whitespace-token (word, freq) table — one shuffle, partial-agg'd. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), "\\s+"), t => t =!= lit(""))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))

  /** Initial symbol sequence of a word: per-code-unit chars, then the
    * word-final marker (omit with `endMark = false` — the oracle-checked
    * pair-count query uses the marker-free form so its DuckDB mirror
    * stays pure substr arithmetic). */
  def toSymbols(word: Column, endMark: Boolean = true): Column = {
    val chars = filter(split(word, ""), c => c =!= lit(""))
    if (endMark) concat(chars, array(lit(EndMark))) else chars
  }

  /** Adjacent-pair counts over a (syms: array<string>, freq) table:
    * sum(freq) per (left, right). The zip of the array with its own tail
    * happens inside the row — only the narrow (left, right, freq) rows
    * reach the shuffle. */
  def pairCounts(wordSyms: DataFrame): DataFrame = {
    val n = size(col("syms"))
    wordSyms
      .where(n >= 2)
      .select(col("freq"), explode(arrays_zip(
        slice(col("syms"), lit(1), n - 1).as("l"),
        slice(col("syms"), lit(2), n - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum("freq").as("cnt"))
  }

  /** One greedy left-to-right merge pass of the pair (a, b) over a symbol
    * array — the fold replaces every non-overlapping occurrence scanning
    * left to right, exactly the reference BPE apply step. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn the top-k merges. Returns the ordered merge list; each round
    * is one pair-count shuffle + a 1-row collect (bounded driver state)
    * + a checkpointed rewrite of the compact word table. */
  def learnMerges(docs: DataFrame, k: Int, textCol: String = "text"): Seq[(String, String)] = {
    require(k >= 0, s"k must be >= 0, got $k")
    var wf = wordFreqs(docs, textCol)
      .select(toSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val top = pairCounts(wf)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = wf.select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint()
        wf.unpersist()
        wf = next
      }
      round += 1
    }
    wf.unpersist()
    merges.result()
  }

  /** Tokenize with a learned merge list: per word, the same fold applied
    * in merge order — no shuffle at all, a pure projection over the
    * corpus (how the trained vocab is consumed at 100 TB). The expression
    * nests one fold per merge, so keep k modest per projection (a
    * production tokenizer bakes the merge table into one codegen pass;
    * this is the composition-of-builtins form). */
  def tokenize(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      filter(split(text, "\\s+"), t => t =!= lit("")),
      w => merges.foldLeft(toSymbols(w)) { case (syms, (a, b)) => applyMerge(syms, a, b) }))
}
