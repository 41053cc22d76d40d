package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: STRICT ascending-index dot product of two
  * double vectors — the quantizer/bucketing kernel behind the IVF cell
  * assignment (q63/q76) and the LSH plane projections (q28/q62).
  *
  * Why native: the declarative spelling `aggregate(zip_with(v, c, *),
  * 0.0, +)` allocates a zipped intermediate array and interprets two
  * lambdas per element; this expression is one fused loop with no
  * allocation, inside whole-stage codegen (round-1 measurements put the
  * HOF pattern ~30× behind a native expression on per-row vector math).
  *
  * Why strict order still holds: the loop accumulates `x[i]*y[i]` for
  * i ascending — the exact IEEE operation sequence of the HOF fold it
  * replaces and of the DuckDB oracle's index-ordered list sum, so argmax
  * decisions built on these dots (cell assignment, plane signs) remain
  * bit-identical across engines (the q63 oracle-parity requirement).
  *
  * Length mismatch takes the shorter vector (fixed-dim data never hits
  * this); element NULLs read as 0.0 via `toDoubleArray`, like
  * [[CosineSimilarity]].
  */
case class SeqDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _),
            org.apache.spark.sql.types.ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"seq_dot requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "seq_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x(i) * y(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x[$i] * $y[$i];
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SeqDot {
  /** Column-API entry point: `SeqDot($"v", $"c")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SeqDot(Bridge.expression(a), Bridge.expression(b)))
}
