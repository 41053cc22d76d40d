package graft

import org.scalatest.funsuite.AnyFunSuite

/** q179 row-pattern semantics, pinned on handcrafted sequences — the
  * cases where regex engines could plausibly diverge (greediness,
  * non-overlap, backtrack-or-fail) — via the same Spark regexp_count
  * the query uses, against hand-derived expectations.
  */
class PatternMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def count(seq: String, pat: String): Long = {
    import spark.implicits._
    Seq(seq).toDF("s")
      .select(org.apache.spark.sql.functions
        .regexp_count($"s", org.apache.spark.sql.functions.lit(pat)))
      .head().getInt(0).toLong
  }

  test("q179: conversion motif counts non-overlapping, backtracks through clicks") {
    assert(count("vp", "v+c*p") === 1L)        // minimal match
    assert(count("vvccp", "v+c*p") === 1L)     // greedy run, one conversion
    assert(count("vpvp", "v+c*p") === 2L)      // non-overlapping repeats
    assert(count("vcvp", "v+c*p") === 1L)      // failed prefix must not mask the later match
    assert(count("vc", "v+c*p") === 0L)        // no purchase, no match
    assert(count("pv", "v+c*p") === 0L)        // order matters
  }

  test("q179: error bursts are maximal runs of length ≥ 2") {
    assert(count("ee", "ee+") === 1L)
    assert(count("eeee", "ee+") === 1L)        // one greedy run, not three pairs
    assert(count("eevee", "ee+") === 2L)       // separated runs count separately
    assert(count("evev", "ee+") === 0L)        // singles never fire
  }

  test("q179: per-user sequences are deterministic under the (ts, event_id) key") {
    val out = SparkEntry.queries("q179_pattern_match")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("seq_fp")).toMap
    val again = SparkEntry.queries("q179_pattern_match")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("seq_fp")).toMap
    assert(out === again, "sequence fingerprints unstable across runs")
    assert(out.nonEmpty)
  }
}
