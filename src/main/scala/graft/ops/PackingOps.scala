package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign each document a position in the stream of
  * fixed-token-budget training sequences formed by concatenating docs in
  * a deterministic order and splitting at budget boundaries (standard
  * GPT-style packing; docs may straddle a boundary).
  *
  * Scale shape: packing needs an ORDER, and a global order is a total
  * sort — unusable at 100 TB. Docs are therefore routed to `buckets`
  * independent streams (`doc_id % buckets`) and packed within each via a
  * per-bucket window cumsum: one shuffle on the bucket key, one
  * sort-within-partition, no global coordination. Buckets are sized so a
  * bucket's rows fit one task (at 10^12 docs: millions of buckets); each
  * bucket's packs are independent, so downstream consumers read
  * (bucket, pack) as the sequence key. Everything is deterministic —
  * same corpus, same packing, any cluster size.
  *
  * Token counts use the corpus-wide convention (single-space split,
  * empties dropped — TextStats). Emitted per doc: its bucket, token
  * count, the first/last pack indices it lands in (straddlers differ),
  * and its start offset within the first pack.
  */
object PackingOps {

  def packSequences(docs: DataFrame, budgetTokens: Int, buckets: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val nTokens = size(filter(split(col(textCol), " "), t => t =!= lit("")))
      .cast("long").as("n_tokens")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), pmod(col(idCol), lit(buckets.toLong)).as("bucket"), nTokens)
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col("bucket"), col("n_tokens"),
        floor((col("cum_end") - col("n_tokens")) / budgetTokens).as("pack_first"),
        // an empty doc "lands" where it starts; otherwise its last token's pack
        when(col("n_tokens") > 0, floor((col("cum_end") - 1) / budgetTokens))
          .otherwise(floor((col("cum_end") - col("n_tokens")) / budgetTokens))
          .as("pack_last"),
        pmod(col("cum_end") - col("n_tokens"), lit(budgetTokens.toLong)).as("pack_offset"))
  }
}
