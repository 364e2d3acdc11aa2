package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Record-driver seam: the reference instantiates a per-format driver
 * (RecordFactory::createRecord, classes/RecordFactory.php) that adapts
 * any harvested payload to one record interface. The graft equivalent is
 * a reader per storage format, each normalizing to the ONE mandated
 * relation `pages(url, warc_ts, html, text, lang, source)` — everything
 * downstream is format-agnostic, exactly like the reference's pipeline
 * after the driver boundary.
 *
 * All readers are plain `spark.read` plans: predicate pushdown / column
 * pruning stay available to Catalyst; nothing is parsed driver-side.
 */
object PageSources {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def normalize(df: DataFrame): DataFrame = {
    val withHtml =
      if (df.columns.contains("html")) df.withColumn("html", col("html").cast("binary"))
      else df.withColumn("html", lit(null).cast("binary"))
    graft.pipeline.DedupStages.withSource(
      withHtml.select(
        col("url").cast("string").as("url"),
        col("warc_ts").cast("timestamp").as("warc_ts"),
        col("html"),
        col("text").cast("string").as("text"),
        col("lang").cast("string").as("lang")))
  }

  /** Columnar store (the primary path; swap for an Iceberg catalog read
    * on a cluster — same relation out). */
  def fromParquet(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.parquet(path))

  /** JSON-lines crawl export: one page object per line; timestamps in
    * ISO-8601. Schema is pinned (no runtime inference scan at scale). */
  def fromJsonLines(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .schema("url STRING, warc_ts TIMESTAMP, html STRING, text STRING, lang STRING")
      .json(path))

  /** CDX-style CSV index + payload columns (header row, escaped quotes). */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .option("header", "true").option("escape", "\"")
      .schema("url STRING, warc_ts TIMESTAMP, text STRING, lang STRING")
      .csv(path))
}
