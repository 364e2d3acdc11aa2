package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed, fully deterministic generator of the mandated
 * `pages(url, warc_ts, html, text, lang, source)` shape
 * (BASELINE.json.input_hint) at arbitrary scale — text is a pure
 * expression of the row id (xxhash64-driven vocabulary picks), so the
 * corpus never touches driver memory and two runs are byte-identical.
 * Used by Bench for the N-vs-4N scaling evidence, where the corpus must
 * be big enough that compute (not stage scheduling) dominates.
 *
 * Duplicate structure: rows come in groups of 20; member 18 is an exact
 * copy of member 0, member 19 a near-duplicate of member 0 (two appended
 * tokens, J ≈ 0.95) — so each group plants one 3-member cluster, giving
 * the pair/verify/CC stages real work at every scale.
 */
object SyntheticPages {

  private val vocab: Seq[String] = Seq(
    "the", "a", "of", "data", "spark", "table", "scan", "merge", "query",
    "row", "filter", "key", "join", "sort", "hash", "batch", "stream",
    "window", "group", "order", "value", "column", "vector", "line",
    "part", "small", "big", "fast", "slow", "agg", "dup", "customer")

  def generate(spark: SparkSession, n: Long, tokensPerDoc: Int = 120): DataFrame = {
    val v = array(vocab.map(lit): _*)
    val langs = array(Seq("en", "de", "fr", "es", "zh").map(lit): _*)

    val member = col("id") % 20
    // members 18/19 reuse member 0's content seed
    val seed = when(member >= 18, col("id") - member).otherwise(col("id"))

    val nTok = lit(tokensPerDoc) + pmod(xxhash64(seed, lit(1)), lit(40)).cast("int")
    val body = concat_ws(" ",
      transform(sequence(lit(0), nTok - 1),
        j => element_at(v, pmod(xxhash64(seed, j), lit(vocab.size)).cast("int") + 1)))
    val text = when(member === 19,
      concat(body, lit(" "),
        concat(lit("zx"), pmod(xxhash64(col("id")), lit(997)).cast("string")),
        lit(" "),
        concat(lit("zy"), pmod(xxhash64(col("id"), lit(2)), lit(997)).cast("string"))))
      .otherwise(body)

    val source = concat(lit("h"), pmod(xxhash64(col("id"), lit(3)), lit(40)).cast("string"))
    spark.range(n).select(
      concat(lit("https://"), source, lit(".example.com/doc/"), col("id")).as("url"),
      expr("timestampadd(SECOND, CAST(id % 31536000 AS INT), timestamp'2024-01-01 00:00:00')")
        .as("warc_ts"),
      concat(lit("<html><body>"), text, lit("</body></html>")).cast("binary").as("html"),
      text.as("text"),
      element_at(langs, pmod(xxhash64(seed, lit(4)), lit(5)).cast("int") + 1).as("lang"),
      source.as("source"))
  }
}
