package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q266 contract — the physics the row-count oracle can't see, shown on
  * a planted 80%-hot-key fixture (large enough that AQE's byte
  * thresholds are comfortably exceeded — the tiny sf0.001 events table
  * compresses below every threshold and AQE rightly just coalesces it):
  *   (a) `repartition(col)` concentrates the hot key: one partition
  *       holds the key's ENTIRE row count (the skewed-writer stall);
  *   (b) the REBALANCE plan bounds every partition well below that —
  *       the hot key is split across tasks — and the executed plan is
  *       an AQE final plan reading a REBALANCE exchange;
  *   (c) on the registered events query: same rows in, same rows out
  *       (runtime re-planning moved rows, never dropped or duplicated
  *       them), and the plan carries the rebalance exchange.
  */
class RebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def partitionSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq

  test("q266: rebalance splits a planted hot key; repartition(col) concentrates it") {
    val s = queries.Relational2.rebalanceSession(spark)
    // wider advisory for the planted fixture (~1 MB of shuffle bytes):
    // ~12 splits instead of hundreds of 2 KB tasks
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    val n = 100000L
    val hotCount = n * 4 / 5
    val skewed = s.range(0, n)
      .selectExpr(
        "CASE WHEN id % 5 < 4 THEN 'hot' ELSE concat('cold_', id % 5) END AS k",
        "id AS v")
      .repartition(8)

    val concSizes = partitionSizes(skewed.repartition(col("k")))
    assert(concSizes.max >= hotCount,
      s"fixture drift: repartition(col) no longer concentrates " +
        s"(max ${concSizes.max} < hot $hotCount)")

    skewed.createOrReplaceTempView("skewed_rb")
    val rb = s.sql("SELECT /*+ REBALANCE(k) */ k, v FROM skewed_rb")
    val rbSizes = partitionSizes(rb)
    assert(rbSizes.max < hotCount,
      s"rebalance failed to split the hot key: max ${rbSizes.max} >= $hotCount")
    assert(rbSizes.length > 1, "rebalance collapsed to one partition")
    assert(rbSizes.sum === concSizes.sum, "row count changed under rebalance")

    rb.collect()
    val plan = rb.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"not an AQE final plan:\n$plan")
    assert(plan.contains("AQEShuffleRead"),
      s"no runtime shuffle re-read in the rebalance plan:\n$plan")
    assert(plan.contains("REBALANCE_PARTITIONS"),
      s"exchange is not a rebalance:\n$plan")
  }

  test("q266: rebalanced events rows equal the source rows exactly") {
    val s = queries.Relational2.rebalanceSession(spark)
    val src = Tables.events(s, d)
      .select("event_id", "event_type", "user_id", "value")
    val rb = queries.Relational2.rebalanced(s, d)
    assert(rb.count() === src.count())
    assert(rb.exceptAll(src).isEmpty && src.exceptAll(rb).isEmpty)
    assert(rb.queryExecution.executedPlan.toString.contains("REBALANCE_PARTITIONS"),
      "registered query lost its rebalance exchange")
  }
}
