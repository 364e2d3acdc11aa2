package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** MixingOps contract: determinism, partition-independence, copy
  * semantics per weight shape, and rate accuracy of the hash threshold. */
class MixingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("integer weights emit exactly w copies; zero drops the group") {
    val mix = MixingOps.weightedMix(corpus(90), "lang",
      Map("en" -> 2.0, "de" -> 0.0), defaultWeight = 1.0)
    val byLang = mix.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 60) // 30 docs x 2 copies
    assert(!byLang.contains("de"))
    assert(byLang("fr") == 30)
    // copies are 1-based and dense
    assert(rows(mix.where($"lang" === "en")).groupBy(_._1).forall(_._2.map(_._2) == Set(1L, 2L)))
  }

  test("fractional weights hit the expected rate and upsample shape") {
    val n = 9999
    val mix = MixingOps.weightedMix(corpus(n), "lang",
      Map("en" -> 0.25, "de" -> 1.6), defaultWeight = 1.0)
    val en = mix.where($"lang" === "en").count().toDouble / (n / 3)
    assert(math.abs(en - 0.25) < 0.03, s"en rate $en")
    val de = mix.where($"lang" === "de").count().toDouble / (n / 3)
    assert(math.abs(de - 1.6) < 0.03, s"de rate $de")
    // the 1.6 group: every kept doc has copy 1; ~60% also have copy 2
    val deCopies = rows(mix.where($"lang" === "de"))
    assert(deCopies.count(_._2 == 1L) == n / 3)
    assert(deCopies.forall(_._2 <= 2L))
  }

  test("deterministic and partition-independent") {
    val base = corpus(500)
    val a = rows(MixingOps.weightedMix(base, "lang", Map("en" -> 0.5), 1.3))
    val b = rows(MixingOps.weightedMix(base.repartition(7), "lang", Map("en" -> 0.5), 1.3))
    val c = rows(MixingOps.weightedMix(base.repartition(1), "lang", Map("en" -> 0.5), 1.3))
    assert(a == b && b == c)
    assert(a.nonEmpty)
  }

  test("thresholdHex edges and hashKeep extremes") {
    assert(MixingOps.thresholdHex(0.0) == "00000000")
    assert(MixingOps.thresholdHex(1.0) == "ffffffff")
    assert(MixingOps.thresholdHex(0.5) == "80000000")
    val df = corpus(100)
    assert(df.where(MixingOps.hashKeep($"doc_id", 1.0)).count() == 100)
    assert(df.where(MixingOps.hashKeep($"doc_id", 0.0)).count() == 0)
    // salts decorrelate: keep-set at 0.5 under two salts differs
    val s1 = df.where(MixingOps.hashKeep($"doc_id", 0.5, "#a")).select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = df.where(MixingOps.hashKeep($"doc_id", 0.5, "#b")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
  }

  private def shardRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("shardAssign: dense 1..n positions per shard, roughly uniform shards") {
    val out = shardRows(MixingOps.shardAssign(corpus(400), nShards = 8))
    assert(out.size == 400)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // positions within a shard are exactly 1..count — a writer can use
    // them as file offsets with no gaps
    byShard.foreach { case (sh, g) =>
      assert(g.map(_._3).toSeq.sorted == (1L to g.size).toSeq, s"shard $sh") }
    // md5-uniform: no shard more than 2x the mean on 400 keys
    assert(byShard.values.map(_.size).max <= 100)
  }

  test("shardAssign: partition-independent and salt-sensitive") {
    val base = corpus(300)
    val a = shardRows(MixingOps.shardAssign(base, 8))
    assert(a == shardRows(MixingOps.shardAssign(base.repartition(7), 8)))
    assert(a == shardRows(MixingOps.shardAssign(base.repartition(1), 8)))
    // a different salt is a fresh epoch shuffle: same keys, different
    // (shard, pos) layout
    val b = shardRows(MixingOps.shardAssign(base, 8, salt = "#epoch2"))
    assert(a.map(_._1) == b.map(_._1))
    assert(a != b)
  }

  test("writeShards: file order per shard is exactly shardAssign's pos order") {
    val base = corpus(300)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    MixingOps.writeShards(base, nShards = 8, dir)
    // window-form spec: key -> (shard, pos)
    val spec = MixingOps.shardAssign(base, 8).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).toSeq
    assert(shardDirs.nonEmpty && spec.size == 300)
    var seen = 0
    shardDirs.foreach { d =>
      val shard = d.getName.stripPrefix("shard=").toLong
      // exactly ONE file per shard (the shard lands wholly in one task)
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"shard $shard has ${parts.length} files")
      val keys = spark.read.parquet(parts.head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      keys.zipWithIndex.foreach { case (k, i) =>
        assert(spec((shard, i + 1L)) == k, s"shard $shard offset $i") }
      seen += keys.length
    }
    assert(seen == 300)
  }
}
