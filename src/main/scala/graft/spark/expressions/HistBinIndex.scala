package graft.spark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

import graft.core.Layout

/**
 * Native Catalyst expression: value -> histogram bin index under a layout.
 *
 * Unlike a Scala UDF this participates in whole-stage codegen: the generated
 * code calls the layout's O(1) bit-twiddled mapping directly on the unboxed
 * double, with no row conversion, no boxing, and null handling inherited
 * from UnaryExpression. The layout instance travels as a codegen reference
 * object.
 */
case class HistBinIndex(child: Expression, layout: Layout) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hist_bin_index requires a DOUBLE argument, got ${child.dataType.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    layout.mapToBinIndex(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val layoutRef = ctx.addReferenceObj("layout", layout, classOf[Layout].getName)
    defineCodeGen(ctx, ev, c => s"$layoutRef.mapToBinIndex($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HistBinIndex =
    copy(child = newChild)

  override def prettyName: String = "hist_bin_index"
}

object HistBinIndex {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level constructor (casts the input to double). */
  def apply(c: Column, layout: Layout): Column =
    ColumnBridge.column(
      HistBinIndex(ColumnBridge.expression(c.cast("double")), layout))
}
