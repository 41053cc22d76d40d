package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Morton (Z-order) code — interleaves
  * the low 16 bits of two non-negative long columns (x at even bit
  * positions, y at odd) into one 32-bit curve position. Sorting or
  * range-partitioning a table by this value co-locates rows that are
  * close in BOTH dimensions, which is what makes file/row-group min-max
  * statistics selective for predicates on EITHER column — the standard
  * multi-dimensional clustering trick behind lakehouse `ZORDER BY`
  * (Delta/Iceberg) table layout (q91).
  *
  * Why native: the declarative spelling is a 16-term shift-mask-sum per
  * row; this is five magic-number spread steps per operand inside
  * whole-stage codegen. The bit result is identical to the naive
  * per-bit formula, which is exactly what the DuckDB oracle computes —
  * integer arithmetic, so parity is exact by construction.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"interleave_bits requires two bigint arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val zx = ctx.freshName("zx")
      val zy = ctx.freshName("zy")
      s"""
         |long $zx = $a & 0xFFFFL;
         |$zx = ($zx | ($zx << 8)) & 0x00FF00FFL;
         |$zx = ($zx | ($zx << 4)) & 0x0F0F0F0FL;
         |$zx = ($zx | ($zx << 2)) & 0x33333333L;
         |$zx = ($zx | ($zx << 1)) & 0x55555555L;
         |long $zy = $b & 0xFFFFL;
         |$zy = ($zy | ($zy << 8)) & 0x00FF00FFL;
         |$zy = ($zy | ($zy << 4)) & 0x0F0F0F0FL;
         |$zy = ($zy | ($zy << 2)) & 0x33333333L;
         |$zy = ($zy | ($zy << 1)) & 0x55555555L;
         |${ev.value} = $zx | ($zy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Column-API entry point: `InterleaveBits($"x", $"y")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits(Bridge.expression(a), Bridge.expression(b)))

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value (the classic Morton magic-number sequence).
    */
  @inline private def spread(v: Long): Long = {
    var z = v & 0xFFFFL
    z = (z | (z << 8)) & 0x00FF00FFL
    z = (z | (z << 4)) & 0x0F0F0F0FL
    z = (z | (z << 2)) & 0x33333333L
    z = (z | (z << 1)) & 0x55555555L
    z
  }

  /** Scala-side Morton code — the expression's eval kernel, shared with
    * the spec's cross-check against the per-bit formula.
    */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
