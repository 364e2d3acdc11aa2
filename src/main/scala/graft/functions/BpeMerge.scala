package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One greedy left-to-right BPE merge pass over a symbol array: every
 * non-overlapping (a, b) occurrence becomes the single symbol a+b,
 * scanning left to right — the reference BPE apply step.
 *
 * Replaces the `aggregate`-fold formulation (`BpeOps.applyMerge`
 * rounds 5–6 early): that fold rebuilt the accumulator array per element
 * (`concat(acc, array(x))`) — O(len²) copying per word under an
 * interpreted HOF, which dominated merge learning once the pair-count
 * recount was made incremental. Single linear pass, same output:
 * the fold's "last output symbol == a && next == b ⇒ replace last with
 * a+b" is equivalent to the two-token lookahead here because a+b can
 * never equal a (b is non-empty), so a merged symbol never re-merges as
 * the left side within the same pass.
 *
 * Null semantics: null array → null; null ELEMENTS cannot occur in the
 * BPE tables (symbols come from non-null `split`), and the builtin fold
 * would have null-poisoned the whole array on one — this expression
 * keeps a null element as a plain non-matching symbol instead, which no
 * caller can observe.
 */
case class BpeMergePass(child: Expression, a: String, b: String)
    extends UnaryExpression {
  require(a.nonEmpty && b.nonEmpty, "merge symbols must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_merge_pass"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val uab = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any =
    BpeMergePass.merge(input.asInstanceOf[ArrayData], ua, ub, uab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val aRef = ctx.addReferenceObj("bpeA", ua, cls)
    val bRef = ctx.addReferenceObj("bpeB", ub, cls)
    val abRef = ctx.addReferenceObj("bpeAB", uab, cls)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.BpeMergePass.merge($c, $aRef, $bRef, $abRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergePass {
  // called from generated code (static forwarder on the companion class)
  def merge(arr: ArrayData, a: UTF8String, b: UTF8String,
            ab: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(a) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i + 1).equals(b)) {
        out(o) = ab
        i += 2
      } else {
        out(o) = cur
        i += 1
      }
      o += 1
    }
    new GenericArrayData(if (o == n) out else out.take(o))
  }

  // called from generated code (static forwarder on the companion class)
  def containsPair(arr: ArrayData, a: UTF8String, b: UTF8String): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i + 1 < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).equals(a) &&
          !arr.isNullAt(i + 1) && arr.getUTF8String(i + 1).equals(b)) return true
      i += 1
    }
    false
  }
}

/** Adjacent-bigram containment: does the symbol array contain (a, b)?
  * The composed form (`exists(arrays_zip(slice…, slice…), …)`) allocated
  * two sliced arrays plus a zipped struct array per word per evaluation,
  * interpreted — the delta-BPE round's filter evaluates this for every
  * word, so it must be a primitive scan. Null elements compare unequal
  * (they cannot occur in the BPE tables; see BpeMergePass). */
case class BpeContainsPair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_contains_pair"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      BpeMergePass.containsPair(input.asInstanceOf[ArrayData], ua, ub))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val aRef = ctx.addReferenceObj("bpeA", ua, cls)
    val bRef = ctx.addReferenceObj("bpeB", ub, cls)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.BpeMergePass.containsPair($c, $aRef, $bRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object bpemerge {
  def mergePass(syms: Column, a: String, b: String): Column =
    Bridge.column(BpeMergePass(Bridge.expression(syms), a, b))

  def containsPair(syms: Column, a: String, b: String): Column =
    Bridge.column(BpeContainsPair(Bridge.expression(syms), a, b))
}
