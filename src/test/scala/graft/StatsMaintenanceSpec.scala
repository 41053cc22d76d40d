package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q129 maintenance contract: the merged refresh must (a) equal a
  * from-scratch Spark recomputation over the full corpus exactly (the
  * algebraic-merge property — partials compose), and (b) actually
  * CONSUME the materialized base artifact: its executed plan scans the
  * scratch parquet, which is the whole point (a refresh that silently
  * re-aggregated the base table would still pass the oracle).
  */
class StatsMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q129: merged refresh ≡ full recompute, and the plan reads the base artifact") {
    val df = SparkEntry.queries("q129_stats_maintenance")(spark, d)
    val merged = df.collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))).toMap

    val full = Tables.documents(spark, d)
      .select(coalesce(col("source"), lit("unknown")).as("source"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))).toMap

    assert(merged == full, "incremental merge drifted from the full recompute")

    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("stats_base"),
      s"refresh plan does not scan the materialized base artifact: ${p.take(2000)}")
  }
}
