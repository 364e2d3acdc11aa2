package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.SyntheticPages
import graft.pipeline.{ConnectedComponents, DedupConfig, DedupPipeline, DedupStages}

/** Per-stage wall-clock breakdown of the dedup pipeline on the synthetic
  * corpus — the tuning loop for the scaling-efficiency work. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "120000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }

    // plan review mode: dump formatted physical plans of the key stages
    // over a real parquet input (pushdown/pruning visible only there)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      val dir = java.nio.file.Files.createTempDirectory("graft-explain").toString
      SyntheticPages.generate(spark, 1000).write.mode("overwrite").parquet(dir)
      val pagesP = spark.read.parquet(dir)
      println("=== signatures over parquet (expect ReadSchema without html) ===")
      DedupStages.signatures(pagesP, cfg).explain("formatted")
      val sigsP = DedupStages.signatures(pagesP, cfg)
      println("=== candidates (expect one exchange per groupBy, partial counts) ===")
      DedupStages.candidates(sigsP, cfg)._1.explain("formatted")
      println("=== verified (expect two shuffled hash joins on ids) ===")
      DedupStages.verified(DedupStages.candidates(sigsP, cfg)._1, sigsP, cfg).explain("formatted")
      println("=== candidatesFromProbes over fused probeRows (the pipeline path) ===")
      val pwP = DedupStages.withIds(pagesP)
      DedupStages.candidatesFromProbes(DedupStages.probeRows(pwP, cfg),
        DedupStages.leanSignatures(pwP, cfg), cfg)._1.explain("formatted")
      spark.stop(); return
    }

    val pages = SyntheticPages.generate(spark, n)
    t("warm-gen-count") { pages.count() }
    // lean path — what DedupPipeline.run actually executes
    val pw = DedupStages.withIds(pages).cache()
    t("pages_ids") { pw.count() }
    val sigs = DedupStages.leanSignatures(pw, cfg).cache()
    t("lean_signatures") { sigs.count() }
    t("probe_rows") { DedupStages.probeRows(pw, cfg).count() }
    val (cand, _) = DedupStages.candidatesFromProbes(
      DedupStages.probeRows(pw, cfg), sigs, cfg)
    val candC = cand.cache()
    t("candidates") { candC.count() }
    val verSide = sigs.select("doc_id", "url", "source", "lang")
      .join(pw.select("doc_id", "text"), "doc_id")
    val ver = DedupStages.verified(candC, verSide, cfg).cache()
    t("verified") { ver.count() }
    t("cc_clusters") { DedupStages.clusters(ver).count() }
    t("full_pipeline_again") {
      val r = DedupPipeline.run(spark, SyntheticPages.generate(spark, n), cfg)
      val x = r.verifiedPairs.count() + r.clusters.count() + r.merged.count()
      r.signatures.unpersist(); r.verifiedPairs.unpersist(); x
    }
    spark.stop()
  }
}
