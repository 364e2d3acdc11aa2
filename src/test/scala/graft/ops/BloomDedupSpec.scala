package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.BloomBridge
import graft.SparkTestSession

/** BloomDedup contract: the pruned result is EXACTLY the left-anti join
  * (the sketch changes the plan, never the answer), including under a
  * deliberately saturated filter where most probes are false positives. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keysOf(df: DataFrame): Set[String] =
    df.select("k").collect().map(r => Option(r.getString(0)).getOrElse("<null>")).toSet

  private def antiOracle(incoming: DataFrame, seen: DataFrame): Set[String] =
    keysOf(incoming.join(seen.select("k").distinct(), Seq("k"), "left_anti"))

  test("pruneNew equals the exact anti-join on an overlapping corpus") {
    val seen = (0 until 200 by 3).map(i => s"h$i").toDF("k")
    val incoming = (0 until 200).map(i => s"h$i").toDF("k")
    val got = keysOf(BloomDedup.pruneNew(incoming, seen, "k"))
    assert(got == antiOracle(incoming, seen))
    assert(got.size == 200 - 67) // the %3 rows really were pruned
  }

  test("a saturated filter (rampant false positives) still yields the exact answer") {
    val seen = (0 until 50).map(i => s"s$i").toDF("k")
    val incoming = (0 until 400).map(i => s"n$i").toDF("k").unionByName(seen)
    // expectedItems=1 at 50 inserted keys: the filter is saturated far past
    // capacity, so most of the 400 disjoint keys probe true — every one of
    // them must come back via the exact re-check
    val got = keysOf(BloomDedup.pruneNew(incoming, seen, "k", expectedItems = 1L))
    assert(got == (0 until 400).map(i => s"n$i").toSet)
  }

  test("no false negatives: a true member never survives the bloom-false branch") {
    val seen = (0 until 1000).map(i => s"m$i").toDF("k")
    val bloom = seen.agg(BloomBridge.bloomAgg(col("k"), 1000L, 0.01).as("bf"))
      .head.getAs[Array[Byte]](0)
    val missed = seen.where(!BloomBridge.mightContain(bloom, col("k"))).count()
    assert(missed == 0L)
  }

  test("empty seen set and null keys pass through as new") {
    val incoming = Seq(Some("a"), Some("b"), None).toDF("k")
    assert(keysOf(BloomDedup.pruneNew(incoming, Seq.empty[String].toDF("k"), "k")) ==
      Set("a", "b", "<null>"))
    // null-keyed incoming rows are kept even when seen is non-empty
    val seen = Seq("a").toDF("k")
    assert(keysOf(BloomDedup.pruneNew(incoming, seen, "k")) == Set("b", "<null>"))
  }
}
