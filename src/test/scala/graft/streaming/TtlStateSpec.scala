package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** q253 contract — state TTL semantics the registered run's 1-hour TTL
  * never exercises:
  *   (a) expiry: a key idle past the TTL reads as ABSENT — its next
  *       batch restarts totals from zero, not from stale state;
  *   (b) persistence: under a TTL far longer than the test, state
  *       continues across micro-batches exactly like untimed state.
  * Timing margins are one-sided (sleep 3 s past a 1.5 s TTL; a 10-min
  * TTL for the persistence leg), so the test cannot flake on scheduler
  * latency in either direction.
  *
  * Harness note (mirrors the q253 registration): TTL forces
  * `TimeMode.ProcessingTime`, whose `shouldRunAnotherBatch` is
  * unconditionally true, so the engine schedules batches forever —
  * `processAllAvailable` never sees quiescence and `AvailableNow`
  * never terminates. Each leg polls the memory sink for the expected
  * emission instead, then stops the query.
  */
class TtlStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** transformWithState requires RocksDB (multiple column families);
    * checkpoint file checksums are off to keep RocksDB snapshot uploads
    * prompt under rapid tiny batches (the q253 registration documents
    * the same hazard).
    */
  private def ttlSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    s
  }

  private def rows(s: SparkSession, name: String): Set[(Long, Long, Long)] =
    s.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Poll (bounded) until the sink satisfies `pred`; the stream keeps
    * running empty batches the whole time, which is exactly the
    * ProcessingTime behavior under test.
    */
  private def awaitSink(s: SparkSession, name: String,
      pred: Set[(Long, Long, Long)] => Boolean): Set[(Long, Long, Long)] = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var cur = rows(s, name)
    while (!pred(cur) && System.nanoTime() < deadline) {
      Thread.sleep(100)
      cur = rows(s, name)
    }
    cur
  }

  test("q253: idle state expires past the TTL; active state survives it") {
    val s = ttlSession()
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Double)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new TtlTotals(1500L),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("user_id", "n_click", "cents")
    val name = "ttl_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // batch 1: both keys seeded
      input.addData((1L, 0.10), (1L, 0.20), (2L, 5.00))
      val b1 = awaitSink(s, name, r => r.exists(_._1 == 1L) && r.exists(_._1 == 2L))
      assert(b1 === Set((1L, 2L, 30L), (2L, 1L, 500L)), s"batch-1 totals wrong: $b1")

      // idle both keys past the 1.5 s TTL (the stream keeps running
      // empty batches — emissions only happen for keys with input)
      Thread.sleep(3000L)

      // key 1 returns after expiry — totals RESTART from zero. Stale
      // state surviving the TTL would emit (1, 3, 40) instead.
      input.addData((1L, 0.10))
      val b2 = awaitSink(s, name, _.contains((1L, 1L, 10L)))
      assert(b2.contains((1L, 1L, 10L)),
        s"state outlived its TTL (expected a restart-from-zero emission): $b2")
      assert(!b2.contains((1L, 3L, 40L)), s"stale state continued past its TTL: $b2")
    } finally {
      q.stop(); q.awaitTermination()
    }
  }

  test("q253: under a long TTL, state persists across batches (control leg)") {
    val s = ttlSession()
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Double)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new TtlTotals(600000L),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("user_id", "n_click", "cents")
    val name = "ttlc_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData((7L, 1.00))
      val b1 = awaitSink(s, name, _.contains((7L, 1L, 100L)))
      assert(b1.contains((7L, 1L, 100L)), s"batch-1 totals wrong: $b1")

      input.addData((7L, 2.00))
      val b2 = awaitSink(s, name, _.contains((7L, 2L, 300L)))
      assert(b2.contains((7L, 2L, 300L)),
        s"TTL'd state failed to persist across batches under a long TTL: $b2")
    } finally {
      q.stop(); q.awaitTermination()
    }
  }
}
