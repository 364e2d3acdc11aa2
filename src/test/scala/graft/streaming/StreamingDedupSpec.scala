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
  }
}
