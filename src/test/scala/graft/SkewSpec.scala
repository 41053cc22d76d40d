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

  test("q201: AQE splits the hot-key partition; rows equal the default-planned join") {
    val df = SparkEntry.queries("q201_aqe_skew_join")(spark, TestSpark.Sf0001)
    val aqe = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the join skewed at test scale:\n${plan.take(3000)}")
    // same logical join under default planning (broadcast allowed, no
    // forced thresholds) — the runtime cure must not change a row
    val nEvents = graft.Tables.events(spark, TestSpark.Sf0001).count()
    val mult = math.max(1L, math.ceil(400000.0 / nEvents).toLong)
    val fact = graft.Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), explode(expr(s"sequence(0L, ${mult - 1}L)")).as("rep"))
      .select((col("event_id") * mult + col("rep")).as("rid"))
      .select(expr("CASE WHEN rid % 10 < 9 THEN 0 ELSE rid % 1000 END").as("k"))
    val dim = spark.range(1000).select(col("id").as("k"),
      concat(lit("seg_"), (col("id") % 7).cast("string")).as("seg"))
    val plain = fact.join(dim, Seq("k")).groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum")).collect()
    assert(aqe.map(_.toSeq).toSet === plain.map(_.toSeq).toSet,
      "runtime skew cure changed the join's answer")
  }

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
