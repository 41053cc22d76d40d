package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler kernel, standalone object so generated Java calls the
  * static forwarder directly (the EntropyCalc/HilbertCalc discipline).
  * Textbook parameters (Winkler '90): scaling p = 0.1, common prefix
  * capped at 4, boost only when the Jaro base exceeds 0.7 — the same
  * constants DuckDB's `jaro_winkler_similarity` implements, which is
  * what makes a cross-engine oracle possible.
  */
object JaroCalc {
  /** Jaro similarity of two strings (match window
    * ⌊max(|a|,|b|)/2⌋ − 1, half-transposition counting).
    */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, counted in halves
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Winkler boost: common-prefix length capped at 4, applied only when
    * the Jaro base exceeds 0.7.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val base = jaro(a, b)
    if (base <= 0.7) return base
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    base + l * 0.1 * (1.0 - base)
  }
}

/** Native Catalyst expression: Jaro–Winkler similarity — the
  * name/title/address matcher behind entity resolution and fuzzy
  * dedup, complementing `levenshtein` (q144): edit distance penalizes
  * transpositions and length equally, while JW rewards shared prefixes
  * and tolerates the swapped-letter typos names actually contain. The
  * 8th native codegen'd expression: the O(|a|·|b|)-window match loop
  * runs inside whole-stage codegen as one static call per row — a
  * Scala UDF here would box two strings per comparison across the
  * candidate-pair stream, exactly where an entity-resolution join is
  * hottest.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler requires two string arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroCalc.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroCalc.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry point: `JaroWinkler($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
