package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.pipeline.{DedupConfig, DedupPipeline, DedupStages}

/** Top-level row type: Encoders can't codegen constructors of
  * test-class-nested case classes. */
case class StreamPage(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                      text: String, lang: String, source: String)

/** readStream → foreachBatch incremental fold: two micro-batches of page
  * upserts end in the same clusters as one cold batch over the union. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private type P = StreamPage
  private val P = StreamPage
  private def p(url: String, text: String, ts: Long = 0L, lang: String = "en"): P =
    P(url, new java.sql.Timestamp(1700000000000L + ts), Array.emptyByteArray, text, lang,
      url.replaceAll("https://([^.]+).*", "$1"))

  test("two streamed upsert batches == one cold batch over the final snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val cfg = DedupConfig()

    val batch1 = Seq(
      p("https://a.example.com/1", "the quick brown fox jumps over the lazy dog again and again and again"),
      p("https://b.example.com/2", "the quick brown fox jumps over the lazy dog again and again and again"),
      p("https://c.example.com/3", "completely unrelated page body with its own words and content here"))
    val batch2 = Seq(
      // upsert: url 3 content changes into a copy of 1 -> joins the cluster
      p("https://c.example.com/3", "the quick brown fox jumps over the lazy dog again and again and again", ts = 5000),
      p("https://d.example.com/4", "another singleton page talking about something else entirely today"))

    val stream = MemoryStream[StreamPage]
    // ProcessingTime(0) keeps the query live across both upsert batches
    // (AvailableNow would stop after draining what existed at start)
    val query = StreamingDedup.attach(stream.toDF(), stateDir, cfg,
      trigger = Trigger.ProcessingTime(0))
    stream.addData(batch1: _*)
    query.processAllAvailable()
    stream.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()

    val got = graft.io.TableIO.read(spark, stateDir, "clusters")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // cold run over the final snapshot (url 3 at its newest content)
    val finalSnapshot = (batch1.filterNot(_.url == "https://c.example.com/3") ++ batch2).toDF()
    val cold = DedupPipeline.run(spark, DedupStages.withSource(finalSnapshot), cfg)
    val want = cold.clusters.collect().map(r => r.getString(0) -> r.getString(1)).toMap

    assert(got == want)
    assert(got.values.toSet.size == 1, "urls 1,2,3 form one cluster")
    assert(got.keySet == Set("https://a.example.com/1", "https://b.example.com/2",
      "https://c.example.com/3"))

    // O(batch) state I/O: batch 2's deltas are bounded by the BATCH (2
    // upserts), not the corpus — the state tables are append-only logs
    import graft.io.DeltaLog
    val batch2Id = DeltaLog.list(stateDir, "pages").map(_.batchId).max
    def rowsAt(table: String) =
      DeltaLog.list(stateDir, table).filter(_.batchId == batch2Id).map(_.rows).sum
    assert(rowsAt("pages") == 2, "pages delta must hold exactly the 2 upserts")
    assert(rowsAt("signatures") == 2, "only the 2 dirty docs re-signed")
    assert(rowsAt("probes") < 100, "probe delta is two docs' worth")
    // resolved views carry the full state regardless
    assert(StreamingDedup.resolvedPages(spark, stateDir).get.count() == 4)
    assert(StreamingDedup.resolvedSignatures(spark, stateDir).get.count() == 4)
  }

  test("bucketed state prunes per-batch reads: a one-bucket batch reads fewer rows than unbucketed, same clusters") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val cfg = DedupConfig()
    // batch 1: 200 distinct-content docs spread across url buckets;
    // batch 2: ONE new doc duplicating doc 7 — touches one url bucket
    // and ~half the probe partitions (one doc's ~44 probe keys over 64
    // partitions), so its reads must undercut the no-pruning layout
    val seed = (0 until 200).map(i => p(s"https://s$i.example.com/$i",
      s"unique page number $i body alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"))
    val dup = Seq(p("https://dup.example.com/x",
      "unique page number 7 body alpha7 beta7 gamma7 delta7 epsilon7 zeta7 eta7 theta7", ts = 9))

    /** records read from file sources during batch 2, at the given bucket
      * count (fresh state dir per run; listener drained by quiescence). */
    def run(nB: Int): (Long, Map[String, String]) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-bkt$nB").toString
      StreamingDedup.processBatch(spark, seed.toDF(), dir, cfg,
        batchId = 0L, compactEvery = 0, stateBuckets = nB)
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        StreamingDedup.processBatch(spark, dup.toDF(), dir, cfg,
          batchId = 1L, compactEvery = 0, stateBuckets = nB)
        // drain the async listener bus: wait until the counter is stable
        var last = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val now = acc.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      val clusters = graft.io.TableIO.read(spark, dir, "clusters")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      (acc.get, clusters)
    }

    val (readsPruned, cPruned) = run(64)
    val (readsFull, cFull) = run(1)
    assert(cPruned == cFull, "bucket layout must not change the clusters")
    assert(cPruned.values.toSet.size == 1 && cPruned.keySet ==
      Set("https://s7.example.com/7", "https://dup.example.com/x"))
    // the batch touches 1 of 64 url buckets and ~half the probe
    // partitions: the pruned run must read meaningfully fewer rows than
    // the single-bucket (no-pruning) layout of the SAME state
    assert(readsPruned < readsFull * 7 / 10,
      s"expected bucket pruning to cut batch-2 reads: pruned=$readsPruned full=$readsFull")
  }

  test("zero-dirty micro-batch (unchanged re-crawl / redelivery) is a safe no-op") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-stream-z").toString
    val cfg = DedupConfig()
    val batch1 = Seq(
      p("https://a.example.com/1", "shared duplicate body words alpha beta gamma delta epsilon zeta"),
      p("https://b.example.com/2", "shared duplicate body words alpha beta gamma delta epsilon zeta"),
      p("https://c.example.com/3", "entirely different third page content with its own words here"))
    StreamingDedup.processBatch(spark, batch1.toDF(), stateDir, cfg, batchId = 0L)
    // batch 2 re-delivers the SAME content (newer ts): zero dirty docs —
    // empty bucketed deltas must append cleanly (the partitioned write of
    // an empty frame used to produce an unreadable delta directory)
    val batch2 = batch1.map(x => x.copy(warc_ts = new java.sql.Timestamp(1700000009000L)))
    val r = StreamingDedup.processBatch(spark, batch2.toDF(), stateDir, cfg, batchId = 1L)
    import graft.io.DeltaLog
    val sigRows = DeltaLog.list(stateDir, "signatures")
      .filter(_.batchId == 1L).map(_.rows).sum
    assert(sigRows == 0, "no dirty docs -> empty signature delta")
    val got = graft.io.TableIO.read(spark, stateDir, "clusters")
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(got.keySet == Set("https://a.example.com/1", "https://b.example.com/2"))
    assert(r.signatures.count() == 3)
  }

  test("compaction preserves state: many small batches with compactEvery=2 still match the cold run") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-stream-c").toString
    val cfg = graft.pipeline.DedupConfig()
    val batches = Seq(
      Seq(p("https://a.example.com/1", "alpha beta gamma delta epsilon zeta eta theta iota kappa")),
      Seq(p("https://b.example.com/2", "alpha beta gamma delta epsilon zeta eta theta iota kappa", ts = 1)),
      Seq(p("https://c.example.com/3", "totally different body of words in this third page here", ts = 2)),
      Seq(p("https://a.example.com/1", "totally different body of words in this third page here", ts = 3)),
      Seq(p("https://d.example.com/4", "alpha beta gamma delta epsilon zeta eta theta iota kappa", ts = 4)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingDedup.processBatch(spark, b.toDF(), stateDir, cfg,
        batchId = i.toLong, compactEvery = 2)
    }
    import graft.io.DeltaLog
    assert(DeltaLog.list(stateDir, "pages").size <= 3,
      "compaction must bound the delta count")
    val got = graft.io.TableIO.read(spark, stateDir, "clusters")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // cold truth over the final snapshot: 1 upserted to page-3's text
    val finalSnapshot = Seq(
      batches(1).head, batches(2).head, batches(3).head, batches(4).head).toDF()
    val cold = graft.pipeline.DedupPipeline.run(spark,
      graft.pipeline.DedupStages.withSource(finalSnapshot), cfg)
    val want = cold.clusters.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("verified_pairs log: split liveness at the compaction watermark, bucket-scoped reads prune physically") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val stateDir = java.nio.file.Files.createTempDirectory("graft-stream-vp").toString
    val cfg = DedupConfig()
    def pair(i: Int, ts: Long): Seq[P] = {
      val t = s"pair number $i shared body alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
      Seq(p(s"https://h$i.example.com/a$i", t, ts), p(s"https://h$i.example.com/b$i", t, ts))
    }
    def kill(i: Int, ts: Long): P =
      p(s"https://h$i.example.com/a$i", s"rewritten solitary body $i with its very own words now omega$i psi$i chi$i phi$i", ts)
    // batch 0: 40 planted pairs; batch 1: pair 40; batch 2: pair 41 +
    // re-sign kills pair 0 → triggers compaction (3 dirs > compactEvery=2);
    // batch 3 (post-compaction): pair 42 + re-sign kills COMPACTED pair 1
    // — exercises the baseline's broadcast anti-join liveness, the d-dir
    // full resolution, and their union
    val batches = Seq(
      (0 until 40).flatMap(pair(_, 0L)),
      pair(40, 1L),
      pair(41, 2L) :+ kill(0, 2L),
      pair(42, 3L) :+ kill(1, 3L))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingDedup.processBatch(spark, b.toDF(), stateDir, cfg,
        batchId = i.toLong, compactEvery = 2)
    }
    import graft.io.DeltaLog
    assert(DeltaLog.list(stateDir, "verified_pairs").exists(DeltaLog.isCompacted),
      "fixture must actually compact the pair log")

    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      df.select("url_a", "url_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val full = pairsOf(StreamingDedup.resolvedVerified(spark, stateDir).get)
    val expected = ((2 until 43).map(i =>
      (s"https://h$i.example.com/a$i", s"https://h$i.example.com/b$i"))).toSet
    assert(full == expected,
      s"missing=${(expected -- full).take(3)} extra=${(full -- expected).take(3)}")

    // bucket-scoped read == full view filtered to that bucket (soundness)
    def bucketOf(url: String): Int = spark.range(1)
      .select(pmod(xxhash64(lit(url)), lit(64L)).cast("int")).head().getInt(0)
    val b2 = bucketOf("https://h2.example.com/a2")
    val pruned = pairsOf(
      StreamingDedup.resolvedVerified(spark, stateDir, buckets = Some(Seq(b2))).get)
    assert(pruned == full.filter(x => bucketOf(x._1) == b2))
    assert(pruned.contains(("https://h2.example.com/a2", "https://h2.example.com/b2")))

    // physical pruning: materializing the one-bucket view reads fewer
    // records off disk than the full view (same state, same session)
    def recordsRead(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        f
        var last = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val now = acc.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get
    }
    val readsFull = recordsRead(
      StreamingDedup.resolvedVerified(spark, stateDir).get.count(): Unit)
    val readsPruned = recordsRead(StreamingDedup.resolvedVerified(
      spark, stateDir, buckets = Some(Seq(b2))).get.count(): Unit)
    assert(readsPruned < readsFull,
      s"bucket-scoped pair read must prune: pruned=$readsPruned full=$readsFull")
  }
}
