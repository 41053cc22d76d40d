package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q186 contract — chained stateful window aggregations in ONE streaming
  * query:
  *   (a) the running query holds TWO state operators (the 1-min and the
  *       6-min aggregation each keep their own store) — not a collapsed
  *       single aggregation;
  *   (b) emission is gated by the OUTER window: data whose inner windows
  *       are closed but whose outer window is still open emits nothing;
  *   (c) once the watermark passes the outer window end, the rollup row
  *       arrives with the counts/sums of ALL its inner windows.
  */
class StreamChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("q186: two state operators; outer-window-gated emission; correct rollup") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val chained = input.toDS().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n1"), sum(col("value")).as("sv1"))
      .groupBy(window(window_time(col("window")), "6 minutes"), col("event_type"))
      .agg(sum(col("n1")).as("n"), sum(col("sv1")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
    val name = "chain_" + java.util.UUID.randomUUID().toString.take(8)
    val q = chained.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // minutes 0 and 1 of the first 6-minute window
      input.addData((ts(10), "a", 1.0), (ts(70), "a", 2.0))
      q.processAllAvailable()
      // advance the watermark past the INNER windows (minute 0 and 1 are
      // closed at watermark 170s) but not the outer 6-minute window
      input.addData((ts(180), "a", 4.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0,
        "rollup emitted before its outer window closed")
      // (a) both stateful levels are live in the same query
      val p = q.lastProgress
      assert(p != null && p.stateOperators.length === 2,
        s"expected 2 state operators, got ${Option(p).map(_.stateOperators.length)}")

      // blow past the outer window end (360s) + watermark (10s)
      input.addData((ts(500), "a", 8.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1, s"expected the one closed rollup, got ${rows.length}")
      val r = rows.head
      assert(r.getAs[java.sql.Timestamp]("wstart") === ts(0))
      assert(r.getAs[Long]("n") === 3L, "rollup lost an inner window's count")
      assert(r.getAs[Double]("sum_value") === 7.0, "rollup lost an inner window's sum")
    } finally q.stop()
  }
}
