package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** The static kernel behind [[PoissonWeight]], in its own object (no
  * companion class) so the generated Java can call the static forwarder
  * `graft.functions.PoissonDraw.weight(long, long)` directly.
  */
object PoissonDraw {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** h = (first 60 bits of md5("b|id")) mod 1000, thresholded to the
    * Poisson(1) pmf steps — EXACTLY the portable SQL chain
    * `conv(substring(md5(concat(b,'|',id)),1,15),16,10) % 1000` +
    * CASE ladder it replaces: 15 hex chars = the high 60 bits of the
    * first 8 digest bytes, so `(BE64 >>> 4) % 1000` is the same value
    * without materializing the hex string.
    */
  def weight(b: Long, id: Long): Long = {
    val md = tlMd.get()
    md.reset()
    val bytes = md.digest(
      (java.lang.Long.toString(b) + "|" + java.lang.Long.toString(id))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    val h = (v >>> 4) % 1000L
    if (h < 368L) 0L else if (h < 736L) 1L
    else if (h < 920L) 2L else if (h < 981L) 3L else 4L
  }
}

/** Native Catalyst expression: the q152 deterministic Poisson-bootstrap
  * weight draw — `weight(b, id)` = the Poisson(1)-pmf threshold applied
  * to a 60-bit md5 hash of `"b|id"`, as ONE codegen'd call.
  *
  * Why native: the portable spelling is a 6-expression interpreted-cost
  * chain per row (string concat → cast binary → md5 → 32-char hex
  * string → substring → radix-16 parse → modulo → 4-way CASE), and q152
  * evaluates it corpus × 32 replicates times — the suite's largest
  * per-row expression constant (the q91 `InterleaveBits` / q93
  * `NfcNormalize` precedent: same contract, fused kernel). The digest
  * bytes are consumed directly (no hex string, no parse) through a
  * thread-local MessageDigest; the draw distribution and every
  * downstream CI bound are bit-identical to the SQL chain, which is
  * exactly what the unchanged DuckDB oracle and `BootstrapCiSpec`'s
  * independent plain-Scala replay pin.
  */
case class PoissonWeight(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poisson_weight requires two bigint arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "poisson_weight"

  override def nullSafeEval(a: Any, b: Any): Any =
    PoissonDraw.weight(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PoissonDraw.weight($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PoissonWeight {
  /** Column-API entry point: `PoissonWeight($"b", $"event_id")`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(PoissonWeight(Bridge.expression(a), Bridge.expression(b)))
}
