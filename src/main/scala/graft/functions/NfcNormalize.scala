package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * the canonical-composition step of a text-normalization pipeline
  * (a crawled corpus mixes precomposed `é` with `e` + U+0301; token
  * counting, dedup hashing and vocabulary building all need ONE spelling
  * per grapheme before they see the text).
  *
  * Why native: Spark ships no normalization function, and a Scala UDF
  * would pay serialization plus a codegen boundary per row. This
  * expression stays inside whole-stage codegen and short-circuits on the
  * common case: `Normalizer.isNormalized` is a cheap scan (ASCII and
  * already-composed text — the overwhelming majority of a real corpus —
  * allocates nothing and returns the input value unchanged).
  *
  * Engine parity: both the JDK and DuckDB (utf8proc) implement the
  * Unicode canonical-composition algorithm, so `nfc(x)` here equals
  * DuckDB `nfc_normalize(x)` for any assigned codepoint both Unicode
  * versions know — the oracle relies on that (q93).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point: `NfcNormalize($"text")`. */
  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
