package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.text.Normalize

/**
 * Column-level reference normalization (classes/MetadataUtils.php:141-153)
 * as a native Expression rather than a Scala UDF: no closure serialization
 * and it stays inside whole-stage codegen (the generated code calls the
 * static pure function directly). The byte-identical contract itself lives
 * in graft.text.Normalize where it is unit-tested without Spark.
 */
case class NormalizeText(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Normalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reference title-key blocking function (classes/MetadataUtils.php:97-132)
  * at column level — same native-Expression treatment. */
case class TitleKey(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "title_key"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalize.createTitleKey(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Normalize.createTitleKey($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reference title-similarity percent (classes/RecordManager.php:
  * 1583-1584) with the reference's BYTE semantics: PHP `levenshtein` is
  * byte-level and `strlen` counts bytes, so the metric is
  * lev(first 255 BYTES of each side) × 100 / byte-length of the LEFT
  * side — Spark's builtin `levenshtein`/`length` are codepoint-based and
  * diverge on any non-ASCII the normalizer preserves (ÄÅÖäåö). Runs only
  * on verify-stage pair participants, so the non-split codegen path is
  * never a scan-stage cost. */
case class TitleLevPct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "title_lev_pct"

  override def nullSafeEval(a: Any, b: Any): Any =
    Normalize.titleLevPct(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.Normalize.titleLevPct($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Reference author-similarity percent (classes/RecordManager.php:
  * 1602-1604): byte-level levenshtein over the first 255 bytes but the
  * denominator is the CODEPOINT length (`mb_strlen`) of the left side —
  * the reference's asymmetric byte/codepoint quirk, preserved. */
case class AuthorLevPct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "author_lev_pct"

  override def nullSafeEval(a: Any, b: Any): Any =
    Normalize.authorLevPct(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.Normalize.authorLevPct($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Reference `authorMatch` (classes/MetadataUtils.php:163-194) at column
  * level — the short-circuit that skips the author lev gate. */
case class AuthorsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "authors_match"

  override def nullSafeEval(a: Any, b: Any): Any =
    Normalize.authorMatch(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.Normalize.authorMatch($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object normalization {
  def normalizeText(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
  def titleKey(c: Column): Column =
    Bridge.column(TitleKey(Bridge.expression(c)))
  def titleLevPct(a: Column, b: Column): Column =
    Bridge.column(TitleLevPct(Bridge.expression(a), Bridge.expression(b)))
  def authorLevPct(a: Column, b: Column): Column =
    Bridge.column(AuthorLevPct(Bridge.expression(a), Bridge.expression(b)))
  def authorsMatch(a: Column, b: Column): Column =
    Bridge.column(AuthorsMatch(Bridge.expression(a), Bridge.expression(b)))
}
