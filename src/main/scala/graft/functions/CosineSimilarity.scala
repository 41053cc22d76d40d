package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double vectors.
  *
  * This is the one place built-ins genuinely fall short (SURVEY.md §7):
  * composing `aggregate(zip_with(...))` allocates an intermediate array
  * and evaluates a lambda per element, outside whole-stage codegen. This
  * expression participates in codegen — the generated Java is one fused
  * loop over the two arrays, no allocation — and keeps the surrounding
  * projection inside a single WholeStageCodegen span.
  *
  * Formula is dot/(sqrt(ssx)·sqrt(ssy)) with ascending-index accumulation,
  * matching the DuckDB oracle's list_cosine_similarity within one ulp
  * (results are rounded to 6 digits before any comparison or threshold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // SQL-reachable (GraftExtensions registers it), so mistyped arguments
  // must fail analysis — toDoubleArray on a non-double array would
  // reinterpret memory silently. Element-NULLs are accepted by the type
  // check (cast array<float> → array<double> keeps containsNull=true for
  // the engine's own columns) and read as 0.0 — the documented kernel
  // semantics, matching toDoubleArray.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _),
            org.apache.spark.sql.types.ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var sx = 0.0; var sy = 0.0; var i = 0
    while (i < n) { dot += x(i) * y(i); sx += x(i) * x(i); sy += y(i) * y(i); i += 1 }
    dot / (math.sqrt(sx) * math.sqrt(sy))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $dot = 0.0; double $sx = 0.0; double $sy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x[$i] * $y[$i];
         |  $sx += $x[$i] * $x[$i];
         |  $sy += $y[$i] * $y[$i];
         |}
         |${ev.value} = $dot / (Math.sqrt($sx) * Math.sqrt($sy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `CosineSimilarity($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
