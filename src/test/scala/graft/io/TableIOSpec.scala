package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Checkpoint-layer semantics: atomic commit, manifest reuse keyed on
  * (configHash, inputFingerprint), invalidation on either changing —
  * the reference's memoized-worklist contract (SolrUpdater.php:333-448). */
class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("commit + manifest + reuse + invalidation") {
    val root = java.nio.file.Files.createTempDirectory("graft-tableio").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")

    var computes = 0
    def compute = { computes += 1; df }

    val first = TableIO.stage(spark, Some(root), "s1", "cfgA", "fpA")(compute)
    assert(first.count() == 2)
    assert(computes == 1)
    assert(TableIO.isCurrent(root, "s1", "cfgA", "fpA"))

    // same keys -> reused, no recompute
    TableIO.stage(spark, Some(root), "s1", "cfgA", "fpA")(compute)
    assert(computes == 1)

    // config change -> recompute
    TableIO.stage(spark, Some(root), "s1", "cfgB", "fpA")(compute)
    assert(computes == 2)

    // input change -> recompute
    TableIO.stage(spark, Some(root), "s1", "cfgB", "fpB")(compute)
    assert(computes == 3)

    val m = TableIO.readManifest(root, "s1").get
    assert(m.rows == 2)
    assert(m.configHash == "cfgB" && m.inputFingerprint == "fpB")
  }

  test("no checkpoint root -> pass-through") {
    var computes = 0
    val out = TableIO.stage(spark, None, "x", "c", "f") {
      computes += 1; Seq(1).toDF("i")
    }
    assert(out.count() == 1 && computes == 1)
  }
}
