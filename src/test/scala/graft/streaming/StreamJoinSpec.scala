package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join and streaming deduplication — the two remaining
  * Structured Streaming operator families: watermarked interval joins
  * (both sides' state bounded by the time condition) and
  * dropDuplicatesWithinWatermark (bounded dedup state).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("watermarked stream-stream interval join matches purchases to prior clicks") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDS().toDF("user", "cts").withWatermark("cts", "1 minute")
    val b = buys.toDS().toDF("buser", "bts").withWatermark("bts", "1 minute")
    // purchase joins a click by the same user within the preceding 5 min
    val joined = c.join(b,
      col("user") === col("buser") &&
        col("bts") >= col("cts") &&
        col("bts") <= col("cts") + expr("INTERVAL 5 MINUTES"))
    val name = "ssj_" + java.util.UUID.randomUUID().toString.take(8)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(10)), (2L, ts(20)))
      buys.addData((1L, ts(100)), (2L, ts(2000))) // user 2 buys too late
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 1L)
    } finally q.stop()
  }

  test("q182: left-outer join emits a never-matched row exactly once, after expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val v = views.toDS().toDF("user", "vts").withWatermark("vts", "1 minute")
    val b = buys.toDS().toDF("buser", "bts").withWatermark("bts", "1 minute")
    // a purchase attributes to a view by the same user within 5 minutes
    val joined = v.join(b,
      col("user") === col("buser") &&
        col("bts") >= col("vts") &&
        col("bts") <= col("vts") + expr("INTERVAL 5 MINUTES"),
      "leftOuter")
    val name = "soj_" + java.util.UUID.randomUUID().toString.take(8)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1 converts; user 2 never does
      views.addData((1L, ts(10)), (2L, ts(20)))
      buys.addData((1L, ts(100)))
      q.processAllAvailable()
      val early = spark.table(name).collect()
      assert(early.count(_.getLong(0) == 1L) === 1, "matched pair not emitted")
      // user 2's outcome is UNDECIDED (watermark hasn't passed vts+5min):
      // the null row must NOT have been emitted yet
      assert(!early.exists(_.getLong(0) == 2L),
        "unmatched row emitted before the watermark could decide it")

      // advance both event clocks far past user 2's horizon (20s + 5min
      // window + 1min watermark); the no-match row must now appear with
      // a null right side
      views.addData((9L, ts(10000)))
      buys.addData((9L, ts(10000)))
      q.processAllAvailable()
      val late = spark.table(name).collect().filter(_.getLong(0) == 2L)
      assert(late.length === 1, s"expected exactly one unmatched row, got ${late.length}")
      assert(late.head.isNullAt(late.head.fieldIndex("buser")),
        "unmatched row carries a non-null right side")

      // and it is emitted EXACTLY once: further watermark advances must
      // not re-emit it
      views.addData((9L, ts(20000)))
      buys.addData((9L, ts(20000)))
      q.processAllAvailable()
      assert(spark.table(name).collect().count(_.getLong(0) == 2L) === 1,
        "expired row re-emitted on a later watermark advance")
    } finally q.stop()
  }

  test("q224: full-outer join emits BOTH sides' never-matched rows once, after expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val v = views.toDS().toDF("user", "vts").withWatermark("vts", "1 minute")
    val b = buys.toDS().toDF("buser", "bts").withWatermark("bts", "1 minute")
    val joined = v.join(b,
      col("user") === col("buser") &&
        col("bts") >= col("vts") &&
        col("bts") <= col("vts") + expr("INTERVAL 5 MINUTES"),
      "fullOuter")
    val name = "sfoj_" + java.util.UUID.randomUUID().toString.take(8)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1 converts; user 2 views and never buys; user 3 buys with
      // no view — the right-side expiry path left outer never runs
      views.addData((1L, ts(10)), (2L, ts(20)))
      buys.addData((1L, ts(100)), (3L, ts(50)))
      q.processAllAvailable()
      val early = spark.table(name).collect()
      assert(early.count(r => !r.isNullAt(0) && r.getLong(0) == 1L) === 1,
        "matched pair not emitted")
      assert(!early.exists(r => !r.isNullAt(0) && r.getLong(0) == 2L) &&
        !early.exists(r => !r.isNullAt(2) && r.getLong(2) == 3L),
        "an unmatched row emitted before the watermark could decide it")

      // advance both event clocks past every horizon
      views.addData((9L, ts(10000)))
      buys.addData((9L, ts(10000)))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      val orphanView = rows.filter(r => !r.isNullAt(0) && r.getLong(0) == 2L)
      val orphanBuy = rows.filter(r => !r.isNullAt(2) && r.getLong(2) == 3L)
      assert(orphanView.length === 1, s"expected one orphan view, got ${orphanView.length}")
      assert(orphanView.head.isNullAt(orphanView.head.fieldIndex("buser")),
        "orphan view carries a non-null right side")
      assert(orphanBuy.length === 1, s"expected one orphan purchase, got ${orphanBuy.length}")
      assert(orphanBuy.head.isNullAt(orphanBuy.head.fieldIndex("user")),
        "orphan purchase carries a non-null left side")

      // exactly once: further advances must not re-emit either orphan
      views.addData((9L, ts(20000)))
      buys.addData((9L, ts(20000)))
      q.processAllAvailable()
      val again = spark.table(name).collect()
      assert(again.count(r => !r.isNullAt(0) && r.getLong(0) == 2L) === 1 &&
        again.count(r => !r.isNullAt(2) && r.getLong(2) == 3L) === 1,
        "an expired orphan re-emitted on a later watermark advance")
    } finally q.stop()
  }

  test("q254: left-semi join emits a double-matched view once and a never-matched view never") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val v = views.toDS().toDF("user", "vts").withWatermark("vts", "1 minute")
    val b = buys.toDS().toDF("buser", "bts").withWatermark("bts", "1 minute")
    val joined = v.join(b,
      col("user") === col("buser") &&
        col("bts") >= col("vts") &&
        col("bts") <= col("vts") + expr("INTERVAL 5 MINUTES"),
      "left_semi")
    val name = "ssemi_" + java.util.UUID.randomUUID().toString.take(8)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1's view matches TWO purchases in-window (the inner join
      // would emit it twice); user 2 views and never buys
      views.addData((1L, ts(10)), (2L, ts(20)))
      buys.addData((1L, ts(100)), (1L, ts(200)))
      q.processAllAvailable()
      val early = spark.table(name).collect()
      assert(early.count(_.getLong(0) == 1L) === 1,
        s"double-matched view must emit exactly once, got ${early.length} rows")
      assert(!early.exists(_.getLong(0) == 2L),
        "unmatched view emitted")

      // later matches for user 1 must NOT re-emit; watermark advances
      // past user 2's window — semi join stays silent about it forever
      buys.addData((1L, ts(250)), (9L, ts(10000)))
      views.addData((9L, ts(10000)))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.count(_.getLong(0) == 1L) === 1,
        "a later in-window match re-emitted an already-emitted semi row")
      assert(!rows.exists(_.getLong(0) == 2L),
        "semi join emitted a never-matched left row after expiry")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed events across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val dedup = input.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val name = "sdd_" + java.util.UUID.randomUUID().toString.take(8)
    val q = dedup.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, ts(10)), (2L, ts(20)))
      q.processAllAvailable()
      // batch 2 replays event 1 (at-least-once delivery) within watermark
      input.addData((1L, ts(15)), (3L, ts(30)))
      q.processAllAvailable()
      val ids = spark.table(name).collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
