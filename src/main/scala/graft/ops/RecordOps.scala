package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Record-level operators around ingestion/export — the web-text analogs of
 * the reference's record plumbing:
 *
 *  - `splitRecords`      — record-splitting transform, 1 harvested doc →
 *    N child records (classes/RecordManager.php:993-1024 runs a splitter
 *    class / XSLT per payload; here: fixed token windows, child position
 *    preserved — a pure generator, `posexplode`, no shuffle)
 *  - `recordCheck`       — ingestion gate: validate a page before it may
 *    enter the store, with a reason column (the reference's record-check
 *    pass rejects unparseable/mandatory-field-missing records)
 *  - `scrubEmpty`        — empty-value scrub keeping 0/0.0/'0'
 *    (classes/SolrUpdater.php:1164-1170: `!(empty($v) && $v !== 0 &&
 *    $v !== 0.0 && $v !== '0')` — PHP-empty '' and null are dropped, the
 *    string '0' is PHP-empty but explicitly kept)
 *  - `xpathFilter`       — export XPath filter
 *    (classes/RecordManager.php:336-345: records pass only when the
 *    configured XPath evaluates non-empty) via Spark's native
 *    `xpath_boolean` over the html payload
 */
object RecordOps {

  /** 1→N record split: `chunkTokens`-token windows of the text, one child
    * row per window with its 0-based position. */
  def splitRecords(docs: DataFrame, chunkTokens: Int = 20,
                   keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = split(col(textCol), " ")
    // integer chunk count (Spark's `/` is true division → DOUBLE)
    val lastChunk = floor((size(col("w")) - 1) / lit(chunkTokens)).cast("int")
    docs.select(col(keyCol), w.as("w"))
      .select(col(keyCol), posexplode(transform(
        sequence(lit(0), lastChunk),
        i => array_join(slice(col("w"), i * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("child_id", "chunk")))
  }

  /** Ingestion gate: first failing rule wins, "ok" otherwise. */
  def recordCheck(pages: DataFrame, allowedLangs: Seq[String]): DataFrame =
    pages.select(col("url"),
      when(col("url").isNull || col("url") === "", "missing_url")
        .when(col("text").isNull || length(col("text")) === 0, "empty_text")
        .when(!col("lang").isin(allowedLangs.map(lit): _*), "unknown_lang")
        .when(col("warc_ts").isNull, "missing_ts")
        .otherwise("ok").as("check"))

  /** Empty-value scrub over a string array: drop null and ''. For string
    * values this single predicate IS the reference's full rule — PHP-empty
    * strings are exactly {null, '', '0'} and the reference's explicit
    * keep-0/0.0/'0' exception re-admits '0', leaving only null and ''
    * dropped. */
  def scrubEmpty(arr: Column): Column =
    filter(arr, v => v.isNotNull && v =!= lit(""))

  /** Export XPath filter: keep pages whose html satisfies the XPath 1.0
    * boolean expression. The xpath rides as a bound string literal with
    * quotes escaped — `contains(//body, 'dup')` style expressions (single
    * quotes are standard XPath syntax) parse fine and nothing from the
    * config string can escape into the SQL. Escaping adapts to the active
    * parser mode: with `spark.sql.parser.escapedStringLiterals` enabled
    * (legacy Hive mode) backslash escapes are inert, so quotes are doubled
    * ('' — valid in both modes for a quote inside a single-quoted literal
    * is NOT true in default mode, hence the branch). */
  def xpathFilter(pages: DataFrame, xpath: String): DataFrame = {
    val legacy = pages.sparkSession.conf
      .getOption("spark.sql.parser.escapedStringLiterals").contains("true")
    val quoted =
      if (legacy) xpath.replace("'", "''")
      else xpath.replace("\\", "\\\\").replace("'", "\\'")
    pages.where(expr(s"xpath_boolean(CAST(html AS STRING), '$quoted')"))
  }
}
