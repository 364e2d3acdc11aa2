package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{DedupConfig, DedupStages}

/**
 * Round-6 optimization harness — NOT part of the frozen driver contract
 * (`Bench.scala` is the contract; this main exists so per-query
 * measurements and plan dumps can be produced without touching it,
 * per the optimization-round rules).
 *
 * Modes (first arg):
 *   - `aux` (default): time every aux bench query in isolation, twice
 *     (cold + warm), with sub-phase splits for the compound ones
 *     (semdedup = pairs + CC + join, knn_ivf = brute + ivf + recall join).
 *     Same action as Bench (`count()`) so numbers are comparable.
 *   - `explain <outDir>`: write `.explain("formatted")` for each query
 *     to `<outDir>/<name>.txt` (the plans/r06 evidence files).
 *   - `pipeline`: run the full dedup pipeline 3× at sf scale and print
 *     per-run walls + per-stage laps (headline iteration loop).
 */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "8m"))
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("aux")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    def docsDf: DataFrame = s.read.parquet(s"$sfDir/documents.parquet")
    def embDf: DataFrame = s.read.parquet(s"$sfDir/embeddings.parquet")

    /** (name, action) pairs mirroring Bench's aux entries bit-for-bit,
      * plus finer-grained sub-phase entries (suffixed `/...`). */
    def entries: Seq[(String, () => Long)] = Seq(
      "vocab_counts" -> (() => graft.ops.TextStats.vocabCounts(docsDf).count()),
      "quality_features" -> (() => graft.ops.TextStats.qualityFeatures(docsDf).count()),
      "knn_brute" -> (() => graft.ops.Similarity.knnBrute(embDf).count()),
      "exact_candidates" -> (() => {
        val p = DedupStages.signatures(DedupStages.pagesFromDocuments(docsDf), DedupConfig())
        DedupStages.exactCandidates(p).count()
      }),
      "mix_sample" -> (() => graft.ops.MixingOps.weightedMix(
        docsDf.select(col("doc_id"), col("lang")), "lang",
        Map("en" -> 1.6, "de" -> 0.5, "fr" -> 2.0), 0.25).count()),
      "pack_sequences" -> (() => graft.ops.PackingOps.packSequences(
        docsDf.select(col("doc_id"), col("text")), 256, 8).count()),
      "bloom_new_docs" -> (() => {
        val seen = docsDf.where(col("doc_id") % 3 === 0)
          .select(md5(col("text")).as("content_hash"))
        val incoming = docsDf.select(col("doc_id"), md5(col("text")).as("content_hash"))
        graft.ops.BloomDedup.pruneNew(incoming, seen, "content_hash").count()
      }),
      "rare_tokens" -> (() =>
        graft.ops.TextStats.rareTokenStats(docsDf.select(col("doc_id"), col("text"))).count()),
      "quality_buckets" -> (() => graft.ops.TextStats.qualityBuckets(docsDf).count()),
      "train_shards" -> (() => graft.ops.MixingOps.shardAssign(
        docsDf.select(col("doc_id")), nShards = 10).count()),
      "semdedup/pairs" -> (() => graft.ops.Similarity.semDedupPairs(
        embDf.select(col("vec_id"), col("embedding"))).count()),
      "semdedup" -> (() => graft.ops.Similarity.semDedup(
        embDf.select(col("vec_id"), col("embedding"))).count()),
      "knn_ivf/ivf_only" -> (() => graft.ops.Similarity.knnIvf(embDf).count()),
      "knn_ivf" -> (() => {
        val exact = graft.ops.Similarity.knnBrute(embDf).select("query_id", "neighbor_id")
        val ivf = graft.ops.Similarity.knnIvf(embDf).select("query_id", "neighbor_id")
        val total = exact.count()
        exact.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
        total
      }),
      "substr_spans" -> (() => graft.ops.ExactSubstr.duplicatedSpans(
        docsDf.select(col("doc_id"), col("text")), k = 20).count()),
      "substr_dedup" -> (() => graft.ops.ExactSubstr.removeDuplicatedSpans(
        docsDf.select(col("doc_id"), col("text")), k = 20).count()),
      "bpe_merges" -> (() =>
        graft.ops.BpeOps.learnMerges(docsDf.select(col("text")), k = 4).length.toLong),
      "outlinks" -> (() => {
        val html = concat(lit("<a href=\""), col("text"), lit("\">x</a> <a href=\"https://s"),
          col("doc_id") % 5, lit(".example.org/p/"), col("doc_id"), lit("\">y</a>"))
        docsDf.select(explode(graft.ops.HtmlOps.outlinks(html)).as("l")).count()
      }))

    /** Plan-dump surfaces: DataFrames (no driver-side loops) per query. */
    def planFrames: Seq[(String, () => DataFrame)] = Seq(
      "exact_candidates" -> (() => {
        val p = DedupStages.signatures(DedupStages.pagesFromDocuments(docsDf), DedupConfig())
        DedupStages.exactCandidates(p)
      }),
      "knn_brute" -> (() => graft.ops.Similarity.knnBrute(embDf)),
      "knn_ivf" -> (() => graft.ops.Similarity.knnIvf(embDf)),
      "semdedup_pairs" -> (() => graft.ops.Similarity.semDedupPairs(
        embDf.select(col("vec_id"), col("embedding")))),
      "substr_spans" -> (() => graft.ops.ExactSubstr.duplicatedSpans(
        docsDf.select(col("doc_id"), col("text")), k = 20)),
      "substr_dedup" -> (() => graft.ops.ExactSubstr.removeDuplicatedSpans(
        docsDf.select(col("doc_id"), col("text")), k = 20)),
      "bpe_pair_counts" -> (() => graft.ops.BpeOps.pairCounts(
        graft.ops.BpeOps.wordFreqs(docsDf.select(col("text")))
          .select(graft.ops.BpeOps.toSymbols(col("word")).as("syms"), col("freq")))),
      "pipeline_candidates" -> (() => {
        val pw = DedupStages.withIds(DedupStages.pagesFromDocuments(docsDf))
        DedupStages.candidatesFromProbes(DedupStages.probeRows(pw, DedupConfig()),
          DedupStages.leanSignatures(pw, DedupConfig()), DedupConfig())._1
      }),
      "pipeline_verified" -> (() => {
        val cfg = DedupConfig()
        val pw = DedupStages.withIds(DedupStages.pagesFromDocuments(docsDf))
        val sigs = DedupStages.leanSignatures(pw, cfg)
        val (cand, _) = DedupStages.candidatesFromProbes(
          DedupStages.probeRows(pw, cfg), sigs, cfg)
        val verSide = sigs.select("doc_id", "url", "source", "lang", "content_hash")
          .join(pw.select("doc_id", "text"), "doc_id")
        DedupStages.verified(cand, verSide, cfg)
      }))

    mode match {
      case "cliqueab" =>
        // interleaved A/B of the fused SortedCliquePairs expression vs
        // the composed sort+zip+expand chain over a synthetic bucket
        // table shaped like the 350k scaling corpus (millions of small
        // multi-member buckets) — interleaving cancels host-load drift
        import org.apache.spark.sql.Column
        val nBuckets = args.lift(1).map(_.toInt).getOrElse(3000000)
        val buckets = s.range(nBuckets.toLong).select(
          transform(sequence(lit(0), pmod(col("id"), lit(3)) + 1),
            i => xxhash64(col("id"), i)).as("ids"),
          transform(sequence(lit(0), pmod(col("id"), lit(3)) + 1),
            i => pmod(xxhash64(i, col("id")), lit(97))).as("tags"))
          .localCheckpoint()
        def pairExpand(m: Column): Column =
          flatten(transform(m, (x, i) =>
            transform(slice(m, i + lit(2), size(m)), y => struct(x.as("a"), y.as("b")))))
        def composed = buckets.select(explode(pairExpand(array_sort(
          zip_with(col("ids"), col("tags"),
            (u, t) => struct(u.as("u"), t.as("t")))))).as("p"))
          .select(col("p.a.u")).agg(count(lit(1))).head().getLong(0)
        def fused = buckets.select(explode(graft.functions.cliquepairs
          .sortedCliquePairs(col("ids"), col("tags"))).as("p"))
          .select(col("p.a.u")).agg(count(lit(1))).head().getLong(0)
        def t(f: => Long): Double = {
          val t0 = System.nanoTime(); val r = f
          val w = (System.nanoTime() - t0) / 1e9
          assert(r > 0); w
        }
        t(fused); t(composed) // warm both
        for (i <- 1 to 3)
          println(f"[cliqueab] round=$i fused=${t(fused)}%.3f composed=${t(composed)}%.3f " +
            f"fused2=${t(fused)}%.3f composed2=${t(composed)}%.3f")

      case "stage" =>
        // stage a deterministic synthetic corpus as parquet (the input
        // shape the scaling legs read) for Profile's serial mode
        val dir = args(1)
        val n = args.lift(2).map(_.toLong).getOrElse(350000L)
        graft.fixtures.SyntheticPages.generate(s, n)
          .write.mode("overwrite").parquet(dir)
        println(s"staged $n docs -> $dir")

      case "explain" =>
        val outDir = args(1)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        for ((name, f) <- planFrames) {
          val plan = f().queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
          println(s"wrote $outDir/$name.txt")
        }

      case "pipelineplan" =>
        // executed (AQE-final) plans of the pipeline stages after a real
        // run — shows ReusedExchange / cache hits that the pre-execution
        // dumps cannot (plan-reuse questions, e.g. whether the verify
        // side relation is computed once or twice)
        val r = graft.pipeline.DedupPipeline.run(s,
          DedupStages.pagesFromDocuments(docsDf), DedupConfig())
        r.merged.count()
        val outDir = args.lift(1).getOrElse("/tmp/graft-pipelineplan")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        for ((name, df) <- Seq("candidate_pairs" -> r.candidatePairs,
            "verified_pairs" -> r.verifiedPairs, "merged" -> r.merged)) {
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            df.queryExecution.executedPlan.toString)
          println(s"wrote $outDir/$name.txt")
        }
        r.signatures.unpersist(); r.verifiedPairs.unpersist(); r.candidatePairs.unpersist()

      case "pipeline" =>
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.put(j.jobId, (j.time, -1L,
              Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val prev = jobs.get(j.jobId)
            if (prev != null) jobs.put(j.jobId, (prev._1, j.time, prev._3))
          }
        })
        for (i <- 1 to 3) {
          jobs.clear()
          val t0 = System.nanoTime()
          val r = graft.pipeline.DedupPipeline.run(s,
            DedupStages.pagesFromDocuments(docsDf), DedupConfig())
          val tRun = (System.nanoTime() - t0) / 1e9
          val laps = Seq(
            "candidates" -> r.candidatePairs, "verify" -> r.verifiedPairs,
            "clusters" -> r.clusters, "merged" -> r.merged).map { case (n, df) =>
            val a = System.nanoTime(); df.count(); n -> (System.nanoTime() - a) / 1e9
          }
          val wall = (System.nanoTime() - t0) / 1e9
          r.signatures.unpersist(); r.verifiedPairs.unpersist(); r.candidatePairs.unpersist()
          // covered = union of job intervals; gap = driver-side (planning,
          // AQE, checkpoint bookkeeping, union-find, collect)
          import scala.jdk.CollectionConverters._
          val done = jobs.asScala.values.filter(_._2 > 0).toSeq.sortBy(_._1)
          var covered = 0.0; var curS = -1L; var curE = -1L
          for ((st, en, _) <- done) {
            if (st > curE) { if (curE > 0) covered += (curE - curS) / 1e3; curS = st; curE = en }
            else curE = math.max(curE, en)
          }
          if (curE > 0) covered += (curE - curS) / 1e3
          println(f"[pipeline] run=$i wall=$wall%.3f run_call=$tRun%.3f " +
            f"jobs=${done.size} covered=$covered%.3f gap=${wall - covered}%.3f " +
            laps.map { case (n, v) => f"$n=$v%.3f" }.mkString(" "))
          if (i == 3) done.foreach { case (st, en, d) =>
            println(f"[pipeline-job] ${(en - st) / 1e3}%7.3fs  ${d.take(90)}")
          }
        }

      case "bpescale" =>
        // delta-vs-full-recount A/B at a scale where per-round COMPUTE
        // dominates the fixed job latency: 200k distinct 32-hex-char
        // words (md5 of an id) → ~6.6M adjacent pairs per full recount;
        // the argmax pair's affected fraction is ~11% of words, so the
        // delta rounds touch ~1/9 of the pair volume.
        import graft.ops.BpeOps
        val k = args.lift(1).map(_.toInt).getOrElse(10)
        val words = s.range(sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "200000").toLong)
          .select(md5(col("id").cast("string")).as("text"))
        words.cache().count()
        def fullRecount(docs: DataFrame, k: Int): Seq[(String, String)] = {
          // the round-5 formulation: every round recounts ALL pairs
          var wf = BpeOps.wordFreqs(docs)
            .select(BpeOps.toSymbols(col("word")).as("syms"), col("freq"))
            .localCheckpoint()
          val out = Seq.newBuilder[(String, String)]
          var round = 0
          var exhausted = false
          while (round < k && !exhausted) {
            val top = BpeOps.pairCounts(wf)
              .orderBy(col("cnt").desc, col("left"), col("right"))
              .limit(1).collect()
            if (top.isEmpty) exhausted = true
            else {
              val (a, b) = (top(0).getString(0), top(0).getString(1))
              out += ((a, b))
              val next = wf.select(
                BpeOps.applyMerge(col("syms"), a, b).as("syms"), col("freq"))
                .localCheckpoint()
              wf.unpersist()
              wf = next
            }
            round += 1
          }
          wf.unpersist()
          out.result()
        }
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val mNew = BpeOps.learnMerges(words, k)
          val tNew = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val mOld = fullRecount(words, k)
          val tOld = (System.nanoTime() - t1) / 1e9
          println(f"[bpescale] run=$i k=$k delta=$tNew%.2fs full_recount=$tOld%.2fs " +
            s"merges_equal=${mNew == mOld}")
        }

      case "bpeprof" =>
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.put(j.jobId, (j.time, -1L,
              Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val prev = jobs.get(j.jobId)
            if (prev != null) jobs.put(j.jobId, (prev._1, j.time, prev._3))
          }
        })
        for (i <- 1 to 2) {
          jobs.clear()
          val t0 = System.nanoTime()
          graft.ops.BpeOps.learnMerges(docsDf.select(col("text")), k = 4)
          println(f"[bpeprof] run=$i wall=${(System.nanoTime() - t0) / 1e9}%.3f")
          import scala.jdk.CollectionConverters._
          jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (st, en, d)) =>
            println(f"[bpeprof-job] $id%3d ${if (en > 0) (en - st) / 1e3 else -1.0}%7.3fs")
          }
        }

      case _ => // aux
        val only = args.drop(1).toSet
        val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
        for ((name, f) <- entries if only.isEmpty || only.contains(name)) {
          s.sparkContext.setJobDescription(s"bench-extra: $name")
          val walls = (1 to reps).map { _ =>
            val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
          }
          println(f"[aux] $name%-22s ${walls.map(w => f"$w%.3f").mkString(" ")}")
        }
        s.sparkContext.setJobDescription(null)
    }
    s.stop()
  }
}
