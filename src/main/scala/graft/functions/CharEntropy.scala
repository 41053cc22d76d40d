package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon-entropy kernel, in a standalone object (no companion class) so
  * the generated Java can call the static forwarder
  * `graft.functions.EntropyCalc.entropyBits(UTF8String)` directly.
  */
object EntropyCalc {
  private val Ln2 = math.log(2.0)

  /** Entropy in BITS of the codepoint distribution of `u`:
    * log2(n) − (Σ c·log2(c))/n over per-codepoint counts c. Counts are
    * accumulated per CODEPOINT (surrogate pairs = one symbol) and folded
    * in ascending-codepoint order, so the double is a deterministic
    * function of the string — independent of hash-map layout or JVM.
    * Empty string → 0.0 (a degenerate distribution has no uncertainty).
    */
  def entropyBits(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Int]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (math.log(c) / Ln2)
    }
    math.log(n.toDouble) / Ln2 - acc / n
  }
}

/** Native Catalyst expression: per-row Shannon entropy (bits) of a
  * string's character distribution — the corpus-quality signal that
  * catches what length/stopword heuristics (q31) miss: keyboard mash,
  * base64 blobs and repeated-character padding score far from natural
  * text (English prose ≈ 4.1–4.4 bits; "aaaa…" = 0; random base64 ≈ 6).
  *
  * Why native (the q93/q152 rationale): the O(len) histogram must run
  * per row with no shuffle and no serialization boundary — an explode →
  * groupBy(doc, char) → agg replay shuffles `total_chars` rows to
  * compute one double per doc, which is exactly the plan a 100 TB
  * corpus cannot afford. This expression stays inside whole-stage
  * codegen (one static call per row); the relational replay exists only
  * as the DuckDB oracle (q250), where it proves the value, not the plan.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    EntropyCalc.entropyBits(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntropyCalc.entropyBits($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  /** Column-API entry point: `CharEntropy($"text")`. */
  def apply(c: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(c)))
}
