package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) key of two int columns: bit-interleaves the two
  * 32-bit values into one 64-bit key, x in the even bit positions and
  * y in the odd. Rows sorted (or range-partitioned) by the key
  * cluster in BOTH dimensions at once, so per-file column min/max
  * stats stay tight on x AND y and a predicate on either dimension
  * prunes files — the multi-dimensional data-layout trick behind
  * Delta/Iceberg `ZORDER BY`, here as a plain codegen'd expression
  * feeding `repartitionByRange` + sortWithinPartitions.
  *
  * Inputs are taken as unsigned 32-bit patterns (callers with signed
  * or wider domains mask/bias first); the magic-number spread runs in
  * 12 shift/mask ops per operand — branch-free inside
  * WholeStageCodegen.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects (int, int), got (${l.sql}, ${r.sql})")
    }

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Int].toLong) |
      (spread(b.asInstanceOf[Int].toLong) << 1)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx"); val y = ctx.freshName("zy")
      def spreadCode(v: String): String =
        s"""$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
      s"""
         |long $x = ((long) $a) & 0xFFFFFFFFL;
         |long $y = ((long) $b) & 0xFFFFFFFFL;
         |${spreadCode(x)}
         |${spreadCode(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)

  override def prettyName: String = "zorder_key"
}

object LayoutFunctions {
  /** Column API: `zorder_key(x, y)` — 64-bit Morton interleave. */
  def zorder_key(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrderKey(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
