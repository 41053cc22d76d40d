package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q211 contract — the persisted dimension is really served from
  * executor storage (InMemoryTableScan) while cached, and the cache is
  * gone after the query returns (no storage leak).
  */
class CacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a persisted dim serves joins from InMemoryTableScan; unpersist releases it") {
    val dim = Tables.customer(spark, TestSpark.Sf0001)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_nationkey").persist()
    try {
      val j = Tables.orders(spark, TestSpark.Sf0001)
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"cached dim not served from memory:\n${plan.take(1200)}")
    } finally dim.unpersist(true)
  }

  test("q211 leaves no cached relation behind") {
    // compare against the pre-existing set: other suites share this JVM
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("q211_cached_dim")(spark, TestSpark.Sf0001).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"q211 leaked persisted relations: $leaked")
  }
}
