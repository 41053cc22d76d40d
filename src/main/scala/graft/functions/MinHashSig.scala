package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}

/** Native MinHash signature over a token array: builds the distinct
  * word `gramN`-gram set row-locally and returns
  * `struct<sig: array<long>, n: bigint>` — the `k` minhashes under the
  * suite's universal-hash family (h = 60-bit-md5 mod p;
  * mhᵢ = min over grams of (aᵢ·h + bᵢ) mod p) plus the distinct-gram
  * count (the Jaccard denominator). Arithmetic is IDENTICAL to
  * graft.queries.Dedup's batch signature and its DuckDB oracle CTEs,
  * so signatures from this expression band-match those bit for bit
  * (`StreamNearDupSpec` pins it relation-for-relation).
  *
  * Why native: the declarative row-local spelling — build the gram
  * array with transform/slice/concat_ws, array_distinct it, hash it,
  * then k `array_min(transform(…))` passes — interprets ~16 HOF
  * lambdas per row with boxed longs and materialized intermediate
  * arrays (HOFs never enter whole-stage codegen); at sf0.1 that was
  * ~4 s of the q342 ingest path. This is ONE fused loop per row: one
  * string + one md5 per DISTINCT gram (minhash is multiset-invariant,
  * but `n` needs the dedup anyway), `k` primitive multiply-adds, zero
  * intermediate arrays (A/B in BASELINE.md r14).
  *
  * Rows with fewer than `gramN` tokens yield n = 0 and an all-`p`
  * signature (callers filter on token count first); NULL tokens are
  * skipped. Eval-only (CodegenFallback): md5 dominates, not dispatch.
  */
case class MinHashSig(child: Expression, gramN: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<string> tokens, got ${t.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def prettyName: String = "minhash_sig"

  @transient private lazy val aCoef: Array[Long] =
    Array.tabulate(k)(MinHashSig.mixA)
  @transient private lazy val bCoef: Array[Long] =
    Array.tabulate(k)(MinHashSig.mixB)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val md = MinHashSig.digests.get()
    val sig = Array.fill(k)(MinHashSig.P)
    val seen = new java.util.HashSet[String]()
    val nTok = toks.numElements()
    var i = 0
    while (i + gramN <= nTok) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < gramN) {
        if (j > 0) sb.append(' ')
        if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        md.reset()
        val hex = MinHashSig.hex(md.digest(gram.getBytes("UTF-8")))
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) % MinHashSig.P
        var s = 0
        while (s < k) {
          val v = (aCoef(s) * h + bCoef(s)) % MinHashSig.P
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    InternalRow(new GenericArrayData(sig), seen.size.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** The suite's universal-hash family (single source of truth — the
    * batch signature in graft.queries.Dedup and every minhash oracle
    * CTE spell out the same constants).
    */
  val P: Long = 2147483647L // Mersenne prime 2^31 - 1
  def mixA(i: Int): Long = (2654435761L * (2L * i + 1)) % P
  def mixB(i: Int): Long = (40503L * (i + 1)) % P

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def apply(tokens: Column, gramN: Int, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), gramN, k))
}
