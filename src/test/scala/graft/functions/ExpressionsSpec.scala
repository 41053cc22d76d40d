package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit/property coverage for the round-4 native expressions:
  * [[InterleaveBits]] (Morton/Z-order code) and [[NfcNormalize]].
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Naive per-bit reference: the formula the DuckDB oracle computes. */
  private def naiveInterleave(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("InterleaveBits matches the per-bit reference formula (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong().abs % 65536L
      val y = rnd.nextLong().abs % 65536L
      assert(InterleaveBits.morton(x, y) === naiveInterleave(x, y), s"($x, $y)")
    }
    // boundary corners
    for (x <- Seq(0L, 1L, 65535L); y <- Seq(0L, 1L, 65535L))
      assert(InterleaveBits.morton(x, y) === naiveInterleave(x, y))
  }

  test("InterleaveBits ignores bits above the low 16 (mask semantics)") {
    assert(InterleaveBits.morton(65536L + 5L, 3L) === naiveInterleave(5L, 3L))
  }

  test("InterleaveBits evaluates identically via codegen on a range source") {
    import spark.implicits._
    val rows = spark.range(1000)
      .select((col("id") * 7 % 65536).as("x"), (col("id") * 13 % 65536).as("y"))
      .select(col("x"), col("y"), InterleaveBits(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, z) => assert(z === naiveInterleave(x, y), s"($x,$y)") }
  }

  test("z-order locality: a +1 step in either dimension flips only low z-bits") {
    // the layout property q91 relies on: nearby (x, y) pairs share their
    // high z-bits, so a bucket (z >> k) covers a bounded rectangle
    for (x <- 0L until 64L; y <- 0L until 64L) {
      val z = naiveInterleave(x, y)
      assert((naiveInterleave(x + 1, y) ^ z) < (1L << 14))
      assert((naiveInterleave(x, y + 1) ^ z) < (1L << 15))
    }
  }

  test("NfcNormalize composes decomposed sequences (codegen + interpreted paths)") {
    import spark.implicits._
    val decomposed = "café" // 'e' + combining acute U+0301
    val composed = "caf\u00e9"
    // codegen path: range source, so the expression is not constant-folded
    val viaDf = spark.range(1)
      .select(concat(lit(decomposed), col("id").cast("string")).as("s"))
      .select(NfcNormalize(col("s")).as("n")).as[String].head()
    assert(viaDf === composed + "0")
    // interpreted path (a Catalyst literal, not a Column wrapper —
    // those are Unevaluable until planned)
    val e = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(decomposed))
    assert(e.eval(null).toString === composed)
  }

  test("NfcNormalize returns the input object unchanged on normalized text (fast path)") {
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii text")
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal.create("x"))
    assert(e.nullSafeEval(in).asInstanceOf[AnyRef] eq in)
  }
}
