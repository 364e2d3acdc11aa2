package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Single-pass vector arithmetic over `array<double>` columns as native
 * codegen Expressions — the hot inner loop of every embedding operator
 * (brute/IVF/SRP kNN, SemDeDup, cosine dup pairs).
 *
 * The round-1..5 formulation composed Catalyst higher-order functions
 * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` for the dot product, plus
 * two more `aggregate(transform(...))` folds for the norms). HOFs are
 * CodegenFallback: each evaluation walks an interpreted expression tree
 * per ELEMENT, allocates the zipped/transformed intermediate arrays, and
 * boxes every double — measured at sf0.1 this made the 64-dim cosine the
 * dominant cost of `knn_brute`/`knn_ivf`/`semdedup` (optimization guide
 * §1.2 step 2 / §4.1: prefer codegen expressions in the per-row hot
 * path). These expressions run the identical arithmetic as ONE fused
 * primitive loop.
 *
 * Bit-identical contract (the oracle hashes results, so this is load-
 * bearing): accumulation order and the exact IEEE op sequence match the
 * HOF formulation —
 *   dot   = ((0.0 + a0*b0) + a1*b1) + ...            (index order)
 *   norm  = sqrt(((0.0 + x0*x0) + x1*x1) + ...)
 *   cosine = dot / (norm(a) * norm(b))               (NOT sqrt(na*nb))
 * Null semantics likewise: length mismatch → null (zip_with pads the
 * short side with nulls, nulling the fold), any null element → null.
 */
private[graft] trait VectorFold { self: BinaryExpression =>
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left.dataType, right.dataType).forall {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** Dot product Σ aᵢ·bᵢ (null on length mismatch / null element). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += $l.getDouble($i) * $r.getDouble($i);
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity dot/(‖a‖·‖b‖) in one pass (same null rules). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $l.getDouble($i);
         |    double $y = $r.getDouble($i);
         |    $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $d / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object vectormath {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
