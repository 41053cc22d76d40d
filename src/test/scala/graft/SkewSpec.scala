package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime re-plan path for hot join keys
  * (SURVEY.md §4: the reference's dynamic self-scheduling maps to Spark's
  * task scheduler + AQE). Thresholds are lowered so the local dataset
  * triggers the same splitting a hot key would at 100 TB.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 99.5% of left rows share key 0 → one hot partition
      val left = spark.range(400000)
        .select(when(col("id") % 200 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(2000).select(col("id").as("k"), col("id").as("rv"))
      // count via an aggregation ON TOP would re-plan; collect() runs
      // exactly j.queryExecution, letting AQE finalize that plan. Keep
      // the payload columns — a pruned constant key column compresses to
      // under the skew threshold in the shuffle.
      val j = left.join(right, "k")
      assert(j.collect().length > 398000) // dominated by the hot key
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
