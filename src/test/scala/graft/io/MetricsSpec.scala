package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.fixtures.CorpusGen
import graft.pipeline.{DedupConfig, DedupPipeline}

/** Lineage/metrics table (north rule: per-partition lineage + metrics for
  * every stage): a checkpointed run commits `stage_metrics` rows whose
  * stage totals match the committed stage tables and whose per-partition
  * rows sum to the totals. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("checkpointed run writes stage_metrics: totals == stage row counts, partitions sum to totals") {
    val corpus = CorpusGen.generate(seed = 5L, nBase = 80)
    val pages = corpus.pages
      .map(p => (p.url, new java.sql.Timestamp(p.warcTs * 1000L), p.html, p.text, p.lang, p.source))
      .toDF("url", "warc_ts", "html", "text", "lang", "source")
    val root = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    val r = DedupPipeline.run(spark, pages, DedupConfig(), Some(root))
    r.clusters.count() // force

    val m = TableIO.read(spark, root, "stage_metrics").cache()
    val stages = m.select("stage").distinct().collect().map(_.getString(0)).toSet
    for (st <- Seq("pages_ids", "signatures", "probes", "candidate_pairs",
        "verified_pairs", "clusters", "merged_clusters"))
      assert(stages.contains(st), s"missing stage $st in metrics")

    // stage totals (partition_id = -1) match the committed tables
    val totals = m.where(col("partition_id") === -1)
      .select("stage", "rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (st <- Seq("signatures", "clusters", "verified_pairs"))
      assert(totals(st) === TableIO.read(spark, root, st).count(),
        s"stage total mismatch for $st")

    // per-partition rows sum to the stage total
    val sums = m.where(col("partition_id") >= 0)
      .groupBy("stage").agg(sum("rows").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((st, total) <- totals if total > 0)
      assert(sums.getOrElse(st, 0L) === total, s"partition sum mismatch for $st")

    // lineage: snapshot_id ties rows to the (config, input) identity
    assert(m.where(col("snapshot_id").isNull || col("snapshot_id") === "").count() === 0)
  }
}
