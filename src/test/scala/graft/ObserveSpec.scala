package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q194 contract — observed metrics ride the gating pass itself: both
  * CollectMetrics operators sit in ONE plan over ONE scan, and the
  * harvested counters agree with independently-computed aggregates.
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q194 metrics equal independent aggregates") {
    val row = SparkEntry.queries("q194_observe_metrics")(spark, TestSpark.Sf0001).head()
    val docs = spark.read.parquet(TestSpark.Sf0001 + "/documents.parquet")
    val want = docs.agg(
      count(lit(1)).as("rows_in"),
      sum(when(col("text") === "", 1L).otherwise(0L)).as("empty_texts"),
      sum(col("n_chars").cast("long")).as("chars_in"),
      sum(when(col("n_chars") >= 200, 1L).otherwise(0L)).as("rows_kept"),
      sum(when(col("n_chars") >= 200, col("n_chars").cast("long")).otherwise(0L)).as("chars_kept"))
      .head()
    assert(row.toSeq === want.toSeq)
    assert(row.getAs[Long]("rows_kept") < row.getAs[Long]("rows_in"),
      "gate kept everything — fixture no longer exercises the filter")
  }

  test("q200: stage funnel is monotone and every stage bites") {
    // (the executed pipeline's plan isn't reachable from the returned
    // metrics DF — its linear-chain/single-execution property is exactly
    // what the oracle equality proves: a double-fired CollectMetrics
    // would double a stage's counters and fail the funnel / the compare)
    val rows = SparkEntry.queries("q200_pipeline_audit")(spark, TestSpark.Sf0001)
      .orderBy("stage").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("0_raw", "1_url_canon", "2_exact_dedup", "3_quality", "4_decontam"))
    val counts = rows.map(_.getLong(1))
    val toks = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"row funnel not monotone: ${counts.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"token funnel not monotone: ${toks.toSeq}")
    assert(counts.last > 0 && counts.last < counts.head,
      "funnel degenerate: nothing survived, or nothing was ever removed")
  }

  test("both observation points are in one single-scan plan") {
    val obsIn = org.apache.spark.sql.Observation()
    val obsOut = org.apache.spark.sql.Observation()
    val df = spark.read.parquet(TestSpark.Sf0001 + "/documents.parquet")
      .observe(obsIn, count(lit(1)).as("a"))
      .where(col("n_chars") >= 200)
      .observe(obsOut, count(lit(1)).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert("CollectMetrics".r.findAllIn(plan).length == 2,
      s"expected two CollectMetrics operators in:\n$plan")
    assert("documents\\.parquet".r.findAllIn(plan).length == 1,
      "metrics instrumentation must not add a scan")
  }
}
