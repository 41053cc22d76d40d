package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** q195 contract — event-time timers across REAL micro-batches (the
  * registered file-source run usually lands in one batch):
  *   (a) nothing emits before the watermark passes a session's seal
  *       point (last + gap);
  *   (b) a session closes on TIMER — its key receives no further input;
  *       only another key's events advance the watermark ("the user
  *       left" — the case record-driven sessionization cannot close);
  *   (c) a key's OLD sealed island emits even while that key has fresh
  *       activity (regression pin: arming the timer at the newest event
  *       instead of the earliest seal point strands exactly this);
  *   (d) every session emits exactly once.
  */
class TimerSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions close on watermark-driven timers, exactly once") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimers(gapUs = 60L * 1000000),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_us", "last_us", "n", "sum_value")
    val name = "timer_sess_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def emitted() = s.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000000L, r.getLong(3), r.getDouble(4)))
    try {
      // batch 1: user 1 has a two-event session; user 2 one event
      input.addData((1L, ts(0), 0.10), (1L, ts(5), 0.20), (2L, ts(0), 5.00))
      q.processAllAvailable()
      assert(emitted().isEmpty, "emitted before the watermark passed any seal point")
      // batch 2: ONLY user 2 speaks (t=200 → watermark 190). User 1's
      // session (seal 5+60=65) must close purely by timer; user 2's old
      // island (seal 60) must close despite user 2's fresh activity.
      input.addData((2L, ts(200), 7.00))
      q.processAllAvailable()
      val afterB2 = emitted().toSet
      assert(afterB2 === Set((1L, 0L, 2L, 0.30), (2L, 0L, 1L, 5.00)),
        s"watermark 190 should seal exactly the two t=0 sessions: $afterB2")
      // batch 3: user 2 speaks again far later → watermark 990 seals the
      // t=200 island; each session appears exactly once overall
      input.addData((2L, ts(1000), 1.00))
      q.processAllAvailable()
      val afterB3 = emitted()
      assert(afterB3.toSet === Set(
        (1L, 0L, 2L, 0.30), (2L, 0L, 1L, 5.00), (2L, 200L, 1L, 7.00)))
      assert(afterB3.length === 3, s"a session emitted more than once: ${afterB3.toList}")
    } finally q.stop()
  }
}
