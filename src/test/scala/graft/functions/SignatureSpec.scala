package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.SparkTestSession

/**
 * Property tests for the signature expressions (SURVEY.md §5.3):
 *  - MinHash agreement ≈ Jaccard (±ε at k=128)
 *  - LSH band guarantee: high-J pairs share ≥1 band w.h.p.
 *  - SimHash: near-identical token bags → small Hamming distance
 *  - Expression eval (interpreted) == codegen'd DataFrame eval
 */
class SignatureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    (a & b).size.toDouble / (a | b).size

  private def sigOf(shingles: Seq[Long], k: Int = 128): Seq[Long] = {
    val df = Seq(Tuple1(shingles)).toDF("s")
    df.select(signatures.minhashSignature(col("s"), k, 42L).as("sig"))
      .head().getSeq[Long](0)
  }

  test("minhash agreement estimates jaccard within 0.12 at k=128") {
    val rnd = new Random(7)
    for (_ <- 0 until 10) {
      val base = Seq.fill(200)(rnd.nextLong()).distinct
      val keep = rnd.nextDouble() * 0.8 + 0.1
      val shared = base.filter(_ => rnd.nextDouble() < keep)
      val other = (shared ++ Seq.fill(200 - shared.size)(rnd.nextLong())).distinct
      val j = jaccard(base.toSet, other.toSet)
      val s1 = sigOf(base)
      val s2 = sigOf(other)
      val est = s1.zip(s2).count { case (a, b) => a == b }.toDouble / s1.size
      assert(math.abs(est - j) < 0.12, s"estimate $est vs true $j")
    }
  }

  test("lsh bands: J>=0.9 pairs share a band; J<=0.1 pairs almost never do") {
    val rnd = new Random(11)
    var hi = 0; var hiShared = 0; var lo = 0; var loShared = 0
    for (i <- 0 until 20) {
      val base = Seq.fill(300)(rnd.nextLong()).distinct
      // high-similarity partner: drop ~3%
      val near = base.filter(_ => rnd.nextDouble() > 0.03)
      // low-similarity partner: fresh
      val far = Seq.fill(300)(rnd.nextLong()).distinct
      def bandsOf(s: Seq[Long]) = {
        val df = Seq(Tuple1(s)).toDF("s")
        df.select(signatures.lshBandHashes(
          signatures.minhashSignature(col("s"), 128, 42L), 32, 4).as("b"))
          .head().getSeq[Long](0).zipWithIndex.toSet
      }
      val b0 = bandsOf(base)
      if ((b0 & bandsOf(near)).nonEmpty) hiShared += 1
      hi += 1
      if ((b0 & bandsOf(far)).nonEmpty) loShared += 1
      lo += 1
    }
    assert(hiShared == hi, s"high-J pairs must always band together here ($hiShared/$hi)")
    assert(loShared <= 1, s"random pairs should essentially never band ($loShared/$lo)")
  }

  test("simhash: small token mutation gives small hamming distance, random gives ~32") {
    val rnd = new Random(13)
    def sim(tokens: Seq[Long]): Long = {
      val df = Seq(Tuple1(tokens)).toDF("t")
      df.select(signatures.simhash64(col("t")).as("s")).head().getLong(0)
    }
    val base = Seq.fill(300)(rnd.nextLong())
    val mutated = base.zipWithIndex.map { case (t, i) => if (i % 50 == 0) rnd.nextLong() else t }
    val random = Seq.fill(300)(rnd.nextLong())
    val dNear = java.lang.Long.bitCount(sim(base) ^ sim(mutated))
    val dFar = java.lang.Long.bitCount(sim(base) ^ sim(random))
    assert(dNear <= 10, s"near hamming $dNear")
    assert(dFar >= 16, s"far hamming $dFar")
  }

  test("interpreted eval matches codegen eval for all signature expressions") {
    val rows = Seq.tabulate(50)(i => Tuple1(Seq.fill(20 + i)(new Random(i).nextLong())))
    val df = rows.toDF("s").select(
      col("s"),
      signatures.minhashSignature(col("s"), 16, 1L).as("mh"),
      signatures.simhash64(col("s")).as("sh"),
      graft.functions.TextColumns.shingleHashes(col("s"), 3).as("sg"))
    val fromCodegen = df.collect()
    // interpreted path: direct nullSafeEval
    rows.zip(fromCodegen).foreach { case (Tuple1(s), row) =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      val arr = ArrayData.toArrayData(s.toArray)
      val mh = MinHashSignature(null, 16, 1L).nullSafeEval(arr)
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val sh = SimHash64(null).nullSafeEval(arr).asInstanceOf[Long]
      val sg = ShingleHashes(null, 3).nullSafeEval(arr)
        .asInstanceOf[ArrayData].toLongArray.toSeq
      assert(row.getSeq[Long](1) == mh)
      assert(row.getLong(2) == sh)
      assert(row.getSeq[Long](3) == sg)
    }
  }

  test("normalize expression matches the pure function through a DataFrame") {
    val inputs = Seq("Hello, World!", "Šš Žž äåö ÄÅÖ", "日本 abc", "ß ss", "a[b]c^_`")
    val out = inputs.toDF("t")
      .select(normalization.normalizeText(col("t")), normalization.titleKey(col("t")))
      .collect()
    inputs.zip(out).foreach { case (in, row) =>
      assert(row.getString(0) == graft.text.Normalize.normalize(in))
      assert(row.getString(1) == graft.text.Normalize.createTitleKey(in))
    }
  }
}
