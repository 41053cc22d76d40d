package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q187 contract — the RocksDB provider swap must be REAL and invisible:
  *   (a) the running query's state operator reports RocksDB custom
  *       metrics (a typo'd provider conf silently falls back to the
  *       default store — the oracle can't see that);
  *   (b) the same aggregation under both providers emits identical rows
  *       (the swap is an executor-memory decision, never a semantic one).
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  private def runAgg(useRocks: Boolean): (Array[org.apache.spark.sql.Row], Boolean) = {
    val s = spark.newSession()
    if (useRocks)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDS().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sv"))
    val name = "rocks_" + java.util.UUID.randomUUID().toString.take(8)
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((ts(10), "a", 1.0), (ts(20), "b", 2.0), (ts(70), "a", 4.0))
      q.processAllAvailable()
      input.addData((ts(500), "a", 8.0)) // close minute 0 and 1
      q.processAllAvailable()
      val metrics = Option(q.lastProgress)
        .map(_.stateOperators.flatMap(_.customMetrics.keySet().toArray).mkString(","))
        .getOrElse("")
      (s.table(name).collect(), metrics.toLowerCase.contains("rocksdb"))
    } finally q.stop()
  }

  test("q187: RocksDB provider reports rocksdb state metrics and matches the default") {
    val (rocksRows, rocksEngaged) = runAgg(useRocks = true)
    assert(rocksEngaged, "state operator reports no rocksdb metrics — provider not engaged")
    val (defaultRows, defaultEngaged) = runAgg(useRocks = false)
    assert(!defaultEngaged, "control run unexpectedly used rocksdb")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("wstart").getTime, r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sv"))
    assert(rocksRows.map(key).sortBy(_.toString).toSeq ===
      defaultRows.map(key).sortBy(_.toString).toSeq,
      "provider swap changed the emitted rows")
  }
}
