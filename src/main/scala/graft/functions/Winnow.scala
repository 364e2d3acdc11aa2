package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Winnowing anchor selection (Schleimer, Wilkerson, Aiken: "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD'03): from a
 * rolling sequence of window hashes, keep the minimum of every w-length
 * window (rightmost minimum on ties). Guarantee: any two documents
 * sharing a contiguous run of ≥ (windowLen + w - 1) tokens share at least
 * one selected anchor — which makes the anchor equi-join a complete
 * candidate generator for exact substring duplication above that length.
 *
 * This implements the north rule's "suffix-array pass for exact substring
 * duplicates" as a Spark-native equivalent: the suffix-array formulation
 * (global suffix sort + adjacent-rank LCP) needs a total order over all
 * corpus suffixes — a full-corpus range-partitioned sort; winnowed
 * anchors give the same detection guarantee with a hash-bucket join, the
 * primitive the rest of the pipeline already scales on.
 */
case class WinnowAnchors(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_anchors"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var last = -1 // index of previously selected anchor
    var i = 0
    val lim = math.max(1, n - w + 1)
    while (i < lim) {
      // rightmost minimum of window [i, i+w)
      var m = i
      var j = i + 1
      val end = math.min(i + w, n)
      while (j < end) {
        if (arr.getLong(j) <= arr.getLong(m)) m = j
        j += 1
      }
      if (m != last) { out += arr.getLong(m); last = m }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val end = ctx.freshName("end")
      val lim = ctx.freshName("lim")
      val res = ctx.freshName("res")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n == 0 ? 0 : $n];
         |int $cnt = 0;
         |int $last = -1;
         |int $lim = $n - $w + 1; if ($lim < 1) $lim = $n == 0 ? 0 : 1;
         |for (int $i = 0; $i < $lim; $i++) {
         |  int $m = $i;
         |  int $end = $i + $w; if ($end > $n) $end = $n;
         |  for (int $j = $i + 1; $j < $end; $j++) {
         |    if ($c.getLong($j) <= $c.getLong($m)) $m = $j;
         |  }
         |  if ($m != $last) { $out[$cnt++] = $c.getLong($m); $last = $m; }
         |}
         |long[] $res = java.util.Arrays.copyOf($out, $cnt);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object winnow {
  def winnowAnchors(c: Column, w: Int): Column =
    Bridge.column(WinnowAnchors(Bridge.expression(c), w))
}
