package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q267 contract — batch-locality of streaming observed metrics: each
  * micro-batch's `observedMetrics` row reports THAT batch's rows only
  * (not cumulative), so per-batch monitors (rate collapse, null burst)
  * see the per-batch truth and the cross-batch sum is lossless.
  */
class StreamObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q267: observed metrics are per-batch and sum losslessly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val name = "obs_" + java.util.UUID.randomUUID().toString.take(8)
    val q = input.toDS().toDF("id", "v")
      .observe("audit", count(lit(1)).as("n"),
        sum(floor(col("v") * 100 + 0.5).cast("long")).as("cents"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, 1.00), (2L, 2.00))
      q.processAllAvailable()
      input.addData((3L, 0.50))
      q.processAllAvailable()
      val batches = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("audit")))
        .map(r => (r.getAs[Long]("n"), r.getAs[Long]("cents")))
        .filter(_._1 > 0L)
      assert(batches === Seq((2L, 300L), (1L, 50L)),
        s"per-batch observations wrong (cumulative or lost): $batches")
      val total = batches.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      assert(total === ((3L, 350L)))
    } finally q.stop()
  }
}
