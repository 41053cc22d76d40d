package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q203 contract — `dropDuplicatesWithinWatermark` across real
  * micro-batches:
  *   (a) a same-key retransmission with a DIFFERENT event time dedups
  *       when it arrives within the watermark delay (the case plain
  *       key+ts dedup cannot handle);
  *   (b) the key's state really drops once the watermark passes — a
  *       far-later replay of the same key EMITS AGAIN. That re-emission
  *       is the proof of bounded state (and the documented contract: the
  *       operator guarantees dedup only within the delay).
  */
class DedupWithinWatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // base the fixture clock well above epoch 0: the stream's INITIAL
  // watermark is 0, and the operator's late filter drops event times
  // at-or-before the current watermark — a ts(0) row would vanish as
  // "late" before dedup ever saw it
  private def ts(sec: Long) = new Timestamp((1_700_000_000L + sec) * 1000L)

  test("dedups different-ts retransmits within the delay; state expires after it") {
    val s = spark.newSession()
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = input.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "30 seconds")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "value")
    val name = "dwm_" + java.util.UUID.randomUUID().toString.take(8)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def emitted() = s.table(name).collect().map(r => (r.getLong(0), r.getDouble(1)))
    try {
      // batch 1: original + a retransmit 10 s later (same key, new ts)
      input.addData((1L, ts(0), 5.0), (1L, ts(10), 5.0), (2L, ts(0), 7.0))
      q.processAllAvailable()
      assert(emitted().toSeq.sorted === Seq((1L, 5.0), (2L, 7.0)),
        "same-key different-ts retransmit was not deduped within the delay")
      // batch 2: advance the watermark far past key 1's expiry
      input.addData((3L, ts(1000), 1.0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 1L) === 1, "expired batch re-deduped nothing yet")
      // batch 3: key 1 replays AFTER its state expired -> emits again
      input.addData((1L, ts(1005), 5.0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 1L) === 2,
        "key state did not expire — dedup state would grow forever")
    } finally q.stop()
  }
}
