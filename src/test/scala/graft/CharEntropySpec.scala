package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q250's native expression contract, independent of the DuckDB oracle:
  * [[graft.functions.EntropyCalc]] against a from-scratch in-test
  * reimplementation (immutable-Map counts, log-sum over p·log2 p — a
  * DIFFERENT formula arrangement than the production log2(n) − Σc·log2(c)/n,
  * so an algebra slip in either cannot cancel), plus the edge cases the
  * corpus never exercises (empty, single-symbol, surrogate pairs,
  * combining marks) and interpreted-vs-codegen parity.
  */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) 0.0
    else {
      val n = cps.length.toDouble
      val probs = cps.groupBy(identity).view.mapValues(_.length / n)
      -probs.values.map(p => p * (math.log(p) / math.log(2.0))).sum
    }
  }

  private def native(s: String): Double =
    graft.functions.EntropyCalc.entropyBits(UTF8String.fromString(s))

  test("differential vs independent reimplementation on varied strings") {
    val cases = Seq(
      "hello world", "the quick brown fox jumps over the lazy dog",
      "aabbccdd", "0123456789" * 3, "mixed CASE With Punct!?;:",
      "ünïcödé tëxt with àccents", "日本語のテキストです",
      "abababababab", "x")
    cases.foreach { s =>
      assert(math.abs(native(s) - reference(s)) < 1e-12, s"mismatch on '$s'")
    }
  }

  test("edge cases: empty → 0, single symbol → 0, uniform → log2(k)") {
    assert(native("") == 0.0)
    assert(native("aaaaaaa") == 0.0)
    assert(math.abs(native("abcd") - 2.0) < 1e-12) // 4 uniform symbols
    assert(math.abs(native("abcdefgh") - 3.0) < 1e-12)
  }

  test("surrogate pairs count as one symbol; combining marks as their own") {
    // U+1F600 (😀) is 2 UTF-16 chars but ONE codepoint: "😀😀" is degenerate
    assert(native("😀😀") == 0.0)
    // e + U+0301 is TWO codepoints → two symbols, entropy 1 bit
    assert(math.abs(native("é") - 1.0) < 1e-12)
  }

  test("interpreted eval and whole-stage codegen agree on the documents table") {
    import graft.functions.CharEntropy
    val docs = Tables.documents(spark, TestSpark.Sf0001).limit(50)
    val viaCodegen = docs.select(col("doc_id"), CharEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaEval = docs.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        graft.functions.CharEntropy(Literal.create(r.getAs[String]("text")))
          .eval(null).asInstanceOf[Double]
    }.toMap
    assert(viaCodegen == viaEval)
    assert(viaCodegen.values.forall(h => h > 3.0 && h < 5.0)) // natural-text band
  }

  test("null propagates, and the q250 flag band is live at sf0.001") {
    import graft.functions.CharEntropy
    val r = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(CharEntropy(col("s"))).collect().head
    assert(r.isNullAt(0))
    val flags = graft.queries.TextAnalysis.charEntropy
      .fn(spark, TestSpark.Sf0001).groupBy("low_entropy").count()
      .collect().map(r2 => r2.getBoolean(0) -> r2.getLong(1)).toMap
    assert(flags.keySet == Set(true, false), s"flag must split the corpus: $flags")
  }
}
