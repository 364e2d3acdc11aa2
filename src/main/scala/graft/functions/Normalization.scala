package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
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

object normalization {
  def normalizeText(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
  def titleKey(c: Column): Column =
    Bridge.column(TitleKey(Bridge.expression(c)))
}
