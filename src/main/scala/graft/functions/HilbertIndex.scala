package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve kernel, in a standalone object (no companion class) so
  * the generated Java can call the static forwarder
  * `graft.functions.HilbertCalc.xy2d(long, long)` directly.
  */
object HilbertCalc {
  /** Curve order: 16 bits per dimension, positions in [0, 2^32). */
  val Order: Int = 16

  /** 2-D Hilbert curve position of cell (x, y), order 16 — the standard
    * rotate-and-flip fold over bit planes from coarsest to finest
    * (Hilbert 1891; the loop formulation popularized by Warren,
    * Hacker's Delight §16 / the Wikipedia xy2d routine — public
    * knowledge, rewritten here). Inputs are masked to their low 16
    * bits, mirroring [[InterleaveBits]]'s domain, so the two layouts
    * are comparable cell-for-cell.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-square so the next bit plane sees canonical
      // orientation (flip only when ry == 0; mirror when additionally
      // rx == 1)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse mapping d → (x, y): the spec walks consecutive curve
    * positions through this to prove the defining adjacency property
    * (|Δx| + |Δy| = 1 between neighbors — the locality guarantee Morton
    * interleaving does not have).
    */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << Order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Native Catalyst expression: 2-D Hilbert-curve position of
  * (x, y) — the alternative multi-dimensional clustering key to
  * [[InterleaveBits]]'s Morton code (q91/q169), with strictly better
  * locality: consecutive curve positions are ALWAYS adjacent cells
  * (Manhattan distance 1), where the Morton curve takes O(2^k) jumps at
  * quadrant seams. Better locality ⇒ a contiguous curve segment (= one
  * file under `repartitionByRange`) covers a tighter rectangle, so
  * min/max envelope pruning (q169's sidecar) skips at least as well —
  * which is why Delta Lake's liquid clustering moved from Z-order to
  * Hilbert. Same 16-bit-per-dimension domain as [[InterleaveBits]] so
  * the layouts are comparable cell-for-cell (q252).
  *
  * Why native: the rotate-and-flip fold is a 16-iteration stateful loop
  * per row — not expressible as a closed-form column expression, and a
  * Scala UDF would box two longs per row and fall out of whole-stage
  * codegen. This stays inside codegen as one static call per row.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index requires two bigint arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCalc.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCalc.xy2d($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-API entry point: `HilbertIndex($"x", $"y")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(HilbertIndex(Bridge.expression(a), Bridge.expression(b)))
}
