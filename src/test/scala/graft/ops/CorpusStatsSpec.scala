package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Corpus-summary contract: exact counts, interpolated percentiles in
  * millis, and the HLL tolerance bit. */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("summary on a hand-checked corpus") {
    // token counts: 1, 2, 3, 4 over hosts a, a, b, c
    val docs = Seq(
      ("a", "w"),
      ("a", "w w"),
      ("b", "w w w"),
      ("c", "w w w w")
    ).toDF("source", "text")
    val r = CorpusStats.summary(docs).head()
    assert(r.getLong(0) == 4L) // n_docs
    assert(r.getLong(1) == 3L) // n_hosts
    assert(r.getBoolean(2))    // HLL within bound at tiny cardinality
    // p50 over [1,2,3,4]: index 0.5*3 = 1.5 -> 2 + 0.5*(3-2) = 2.5
    assert(r.getLong(3) == 2500L)
    // p90: index 0.9*3 = 2.7 -> 3 + 0.7*(4-3) = 3.7
    assert(r.getLong(4) == 3700L)
  }

  test("empty-string tokens are excluded like everywhere else") {
    val docs = Seq(("h", "a  b   c")).toDF("source", "text") // 3 tokens
    val r = CorpusStats.summary(docs).head()
    assert(r.getLong(3) == 3000L && r.getLong(4) == 3000L)
  }

  test("HLL bound holds across a wider cardinality sweep") {
    val docs = (1 to 2000)
      .map(i => (s"host-${i % 731}", "some text here")).toDF("source", "text")
    val r = CorpusStats.summary(docs).head()
    assert(r.getLong(1) == 731L)
    assert(r.getBoolean(2), s"HLL estimate out of bound vs exact 731")
  }
}
