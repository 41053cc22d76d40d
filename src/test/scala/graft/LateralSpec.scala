package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q193 contract — the LATERAL correlated LIMIT-under-ORDER decorrelates:
  * same rows as the explicit window top-k formulation, from a plan that
  * scans customer ONCE (no per-outer-row re-execution).
  */
class LateralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q193 equals the explicit window top-k formulation") {
    val lateral = SparkEntry.queries("q193_lateral_topk")(spark, TestSpark.Sf0001)
    val cust = spark.read.parquet(TestSpark.Sf0001 + "/customer.parquet")
    val nation = spark.read.parquet(TestSpark.Sf0001 + "/nation.parquet")
    val windowed = cust
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
      .where(col("rk") <= 2)
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select("n_nationkey", "n_name", "c_custkey", "c_name", "c_acctbal")
    assert(lateral.except(windowed).count() === 0 &&
      windowed.except(lateral).count() === 0)
  }

  test("q193 plan scans customer once — the correlation decorrelated") {
    val plan = SparkEntry.queries("q193_lateral_topk")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    val customerScans = "customer\\.parquet".r.findAllIn(plan).length
    assert(customerScans == 1,
      s"expected one customer scan after decorrelation, plan had $customerScans:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "lateral fell back to a cartesian re-execution plan")
  }
}
