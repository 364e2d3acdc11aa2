package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-tier corpus statistics.
  *
  * At the 10¹²-doc design point, "how many distinct hosts / how long
  * are documents" is answered with mergeable sketches, not exact
  * distincts: HyperLogLog++ (`approx_count_distinct`) needs a few KB
  * of state per partition and one tiny final merge, where
  * `count(distinct)` shuffles every key. This operator emits both at
  * test scale — the exact values oracle-check row-for-row, and the
  * sketch rides with a tolerance contract (|approx − exact| within the
  * configured relative error) the same way `q_knn_ivf` pins its recall
  * floor: the artifact then records a regression of the sketch path,
  * not just its presence.
  *
  * Percentiles use Spark's EXACT `percentile` here (single final
  * aggregation — fine for a summary row even at scale since the
  * per-partition partials are bounded by value cardinality, and
  * token counts have ≤ ~10⁶ distinct values at any corpus size);
  * `percentile_approx` is the drop-in at higher cardinality. Values
  * are scaled to integer millis so the DuckDB replay (quantile_cont,
  * the same (n−1)·p linear interpolation) compares hash-stably. */
object CorpusStats {

  /** One-row corpus summary over (sourceCol, textCol):
    * n_docs, n_hosts (exact), hll_hosts_ok (HLL++ within rsd·1.2 of
    * exact — the sketch's own error bound with 20% slack), and exact
    * interpolated token-count percentiles in millis. */
  def summary(docs: DataFrame, sourceCol: String = "source",
              textCol: String = "text", rsd: Double = 0.05): DataFrame = {
    val toks = size(filter(split(col(textCol), " "), t => t =!= lit("")))
      .cast("long")
    docs.select(col(sourceCol).as("src"), toks.as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("src")).as("n_hosts"),
        approx_count_distinct(col("src"), rsd).as("hll_hosts"),
        percentile(col("n_tokens"), lit(0.5)).as("p50"),
        percentile(col("n_tokens"), lit(0.9)).as("p90"))
      .select(
        col("n_docs"),
        col("n_hosts"),
        (abs(col("hll_hosts") - col("n_hosts")) <=
          greatest(lit(1.0), col("n_hosts") * rsd * 1.2)).as("hll_hosts_ok"),
        round(col("p50") * 1000).cast("long").as("p50_tokens_milli"),
        round(col("p90") * 1000).cast("long").as("p90_tokens_milli"))
  }
}
