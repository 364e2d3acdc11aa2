package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Seeded coefficient tables shared by the signature expressions. Generated
 * by a SplitMix64 stream from a fixed seed so signatures are deterministic
 * across runs/JVMs (the reference's dedup keys are likewise deterministic
 * functions of the record, classes/RecordManager.php:1296-1310).
 */
object SignatureCoefficients {
  def splitmix64(state: Long): (Long, Long) = {
    val z0 = state + 0x9E3779B97F4A7C15L
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z0, z ^ (z >>> 31))
  }

  /** k pairs (a odd, b) defining 64-bit linear permutations h(x) = a*x + b. */
  def linearPerms(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var st = seed
    var i = 0
    while (i < k) {
      val (s1, va) = splitmix64(st)
      val (s2, vb) = splitmix64(s1)
      st = s2
      a(i) = va | 1L // odd => bijection on Z_2^64
      b(i) = vb
      i += 1
    }
    (a, b)
  }
}

/**
 * Batched MinHash: input = array<bigint> of (distinct) shingle hashes,
 * output = array<bigint> of k signature minima, computed in ONE pass over
 * the shingles (the reference computes all blocking keys for a record in
 * one place too, classes/RecordManager.php:1296-1310; here the "keys" are
 * the k permuted minima).
 *
 * A native Expression with codegen rather than a Scala UDF: no
 * serialization of the lambda, no Row boxing of the input array — the
 * generated Java reads the UnsafeArrayData longs directly.
 */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  private lazy val (coefA, coefB) = SignatureCoefficients.linearPerms(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = coefA(j) * h + coefB(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $aRef[$j] * $h + $bRef[$j];
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * LSH band hashes: input = the minhash signature (array<bigint>, length
 * b*r), output = array<bigint> of b band hashes, band i = mix of the r
 * signature values in rows [i*r, (i+1)*r) together with the band index (so
 * identical row-groups in different bands never collide). Exploding this
 * array yields the band table that the candidate self-join runs on
 * (the analog of the reference's sparse key indexes, dbscripts/mongo.js:2-4).
 */
case class LshBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_band_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L * (b + 1)
      var r = 0
      while (r < rowsPerBand) {
        var z = arr.getLong(b * rowsPerBand + r) + 0x9E3779B97F4A7C15L * (r + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ z) * 0x94D049BB133111EBL
        r += 1
      }
      out(b) = h ^ (h >>> 31)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 0x9E3779B97F4A7C15L * ($b + 1);
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    long $z = $c.getLong($b * $rowsPerBand + $r) + 0x9E3779B97F4A7C15L * ($r + 1);
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $h = ($h ^ $z) * 0x94D049BB133111EBL;
         |  }
         |  $out[$b] = $h ^ ($h >>> 31);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 64-bit SimHash: input = array<bigint> of token hashes (NOT distinct —
 * each occurrence votes), output = bigint. Bit b of the output is 1 iff
 * the sum over tokens of (+1 if bit b of the token hash is 1 else -1) is
 * positive. This is the verification-channel analog of the reference's
 * thresholded-similarity `matchRecords` (classes/RecordManager.php:1482-1623):
 * Hamming distance on SimHash ≈ cosine distance on token profiles.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $acc = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $acc[$b] += (($h >>> $b) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points (the graft analog of functions._). */
object signatures {
  def minhashSignature(c: Column, k: Int, seed: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), k, seed))

  def lshBandHashes(c: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(LshBandHashes(Bridge.expression(c), bands, rowsPerBand))

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
}
