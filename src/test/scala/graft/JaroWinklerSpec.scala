package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{JaroCalc, JaroWinkler}

/** q270 contract — the expression against the literature and itself:
  *   (a) classic published vectors (Winkler's own MARTHA/MARHTA etc.)
  *       to 1e-12;
  *   (b) the boost-threshold edge: a shared prefix does NOT boost when
  *       the Jaro base is ≤ 0.7 (the DuckDB-compatible rule — getting
  *       this wrong would fail the oracle on exactly the borderline
  *       pairs);
  *   (c) degenerate cases (equal, empty, no match);
  *   (d) interpreted eval ≡ codegen eval through the Column API.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    JaroCalc.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic vectors match the literature") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
  }

  test("boost threshold: no prefix bonus at or below 0.7 Jaro") {
    // "prefixaaaa"/"prefizzzzz": Jaro = 2/3 — shares a 4-char prefix
    // but must NOT be boosted (DuckDB agrees: 0.6667 for both fns)
    assert(math.abs(jw("prefixaaaa", "prefizzzzz") - 2.0 / 3.0) < 1e-12)
    // above threshold the bonus applies: prefix 4 of aaaaaaaaxx/…yy
    assert(math.abs(jw("aaaaaaaaxx", "aaaaaaaayy") - 0.92) < 1e-12)
  }

  test("degenerate cases") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("interpreted eval equals codegen through the Column API") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("prefixaaaa", "prefizzzzz"), ("Customer#000000097", "Customer#790000000"))
    val viaExpr = pairs.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(viaExpr((a, b)) === jw(a, b), s"codegen mismatch on ($a, $b)")
    }
  }
}
