package graft.streaming

import java.time.Instant

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The state-store path of Sessionize: state must carry open sessions
  * across micro-batches, emitting a session only once its gap has been
  * observed in a later batch.
  */
class StreamingSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(user: Long, sec: Long, value: Double) =
    Sessionize.Event(user, Instant.ofEpochSecond(sec), value)

  test("open sessions survive micro-batch boundaries in the state store") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessions(
      input.toDS(), gapUs = 60L * 1000000, flushTrailing = false)
    val name = "sess_" + java.util.UUID.randomUUID().toString.take(8)
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: two events 30s apart — same session, nothing emitted yet
      input.addData(ev(1, 0, 1.0), ev(1, 30, 2.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0)

      // batch 2: an event 45s later still extends it; then a 2000s jump
      // closes it — the closed session must include batch-1 events
      input.addData(ev(1, 75, 3.0), ev(1, 3000, 4.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Long]("user_id") === 1L)
      assert(r.getAs[Long]("n") === 3L) // events at 0, 30, 75
      assert(r.getAs[Double]("sum_value") === 6.0)
    } finally q.stop()
  }

  test("far-late stray event is emitted alone and does not fragment the live session") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessions(
      input.toDS(), gapUs = 60L * 1000000, flushTrailing = false)
    val name = "stray_" + java.util.UUID.randomUUID().toString.take(8)
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1.0))
      q.processAllAvailable()
      // a stray event 1000s before the open session plus a live extension
      input.addData(ev(1, 0, 5.0), ev(1, 1010, 2.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      // only the stray closed; the live session (1000..1010) stays open
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("n") === 1L)
      assert(rows.head.getAs[Double]("sum_value") === 5.0)
    } finally q.stop()
  }

  test("mutually-close far-late strays merge into ONE closed session") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessions(
      input.toDS(), gapUs = 60L * 1000000, flushTrailing = false)
    val name = "straymerge_" + java.util.UUID.randomUUID().toString.take(8)
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1.0))
      q.processAllAvailable()
      // two strays 30s apart (within gap of each other, both ≥ gap before
      // the open session's start) — batch session_window semantics would
      // put them in one session, so the replay must too
      input.addData(ev(1, 0, 5.0), ev(1, 30, 7.0), ev(1, 1010, 2.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1, rows.mkString(", "))
      assert(rows.head.getAs[Long]("n") === 2L)
      assert(rows.head.getAs[Double]("sum_value") === 12.0)
      assert(rows.head.getAs[java.sql.Timestamp]("session_start").getTime === 0L)
    } finally q.stop()
  }

  test("stray that chains to the open session via a later downward extension merges in") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessions(
      input.toDS(), gapUs = 60L * 1000000, flushTrailing = false)
    val name = "straychain_" + java.util.UUID.randomUUID().toString.take(8)
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1.0))
      q.processAllAvailable()
      // 920 arrives while the session starts at 1000 (80s ≥ gap → stray),
      // but 950 then extends the session down to 950 — batch
      // session_window over {920, 950, 1000} is ONE session, so the
      // buffered stray must chain back in rather than close alone
      input.addData(ev(1, 920, 5.0), ev(1, 950, 2.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0) // nothing closed yet
      input.addData(ev(1, 5000, 9.0)) // far jump closes the merged session
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1, rows.mkString(", "))
      assert(rows.head.getAs[Long]("n") === 3L)
      assert(rows.head.getAs[Double]("sum_value") === 8.0)
      assert(rows.head.getAs[java.sql.Timestamp]("session_start").getTime === 920L * 1000)
    } finally q.stop()
  }

  test("watermark drops late events in append-mode windowed aggregation") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val name = "late_" + java.util.UUID.randomUUID().toString.take(8)
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: events in window [0,60); watermark advances to 300-10
      input.addData((t(10), 1.0), (t(300), 1.0))
      q.processAllAvailable()
      // batch 2: a late event for the long-closed [0,60) window — dropped;
      // plus one more beyond, closing nothing new
      input.addData((t(20), 1.0), (t(600), 1.0))
      q.processAllAvailable()
      val out = spark.table(name).collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toMap
      // [0,60) must have been emitted with ONLY the on-time event
      assert(out.get(0L).contains(1L), s"got $out")
    } finally q.stop()
  }

  test("property: random watermark-plausible deliveries ≡ batch gaps-and-islands") {
    // Differential test: any delivery order in which no event arrives
    // ≥ gap later than the maximum already delivered (the watermark
    // regime — anything later would be watermark-dropped in production)
    // must produce exactly the sessions of the batch gaps-and-islands
    // rule. Generator: sorted events → consecutive batch split → demote
    // a couple of events to later batches only when they stay within gap
    // of everything delivered before them.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val GapSec = 60L
    def batchSessions(ts: Seq[Long]): Seq[(Long, Long, Double)] = {
      // (session_start, n, sum) with value = ts.toDouble for easy sums
      val sorted = ts.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var start = -1L; var last = -1L; var n = 0L; var sum = 0.0
      sorted.foreach { t =>
        if (start < 0 || t - last >= GapSec) {
          if (start >= 0) out += ((start, n, sum))
          start = t; last = t; n = 1; sum = t.toDouble
        } else { last = t; n += 1; sum += t.toDouble }
      }
      if (start >= 0) out += ((start, n, sum))
      out.toSeq
    }
    val rnd = new scala.util.Random(13)
    for (iter <- 1 to 6) {
      // random event times over a range that produces multiple sessions
      val n = 6 + rnd.nextInt(7)
      val ts = Seq.fill(n)(rnd.nextInt(600).toLong).distinct.sorted
      // consecutive split into 1..3 batches
      val nBatches = 1 + rnd.nextInt(3)
      val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(ts.size)).sorted
      var batches = (Seq(0) ++ cuts ++ Seq(ts.size)).sliding(2).collect {
        case Seq(a, b) if b > a => ts.slice(a, b).toBuffer
      }.toSeq
      // demote up to 2 events to a later batch when watermark-plausible
      if (batches.size > 1) {
        for (_ <- 1 to 2) {
          val from = rnd.nextInt(batches.size - 1)
          if (batches(from).nonEmpty) {
            val ev0 = batches(from)(rnd.nextInt(batches(from).size))
            val to = from + 1 + rnd.nextInt(batches.size - from - 1)
            val maxBefore = batches.take(to).flatten.filterNot(_ == ev0)
              .foldLeft(Long.MinValue)(math.max)
            if (maxBefore == Long.MinValue || ev0 >= maxBefore - GapSec + 1) {
              batches(from) -= ev0
              batches(to) += ev0
            }
          }
        }
      }
      val expected = batchSessions(ts).toSet
      val input = MemoryStream[Sessionize.Event]
      val sessions = Sessionize.sessions(
        input.toDS(), gapUs = GapSec * 1000000, flushTrailing = false)
      val name = s"prop${iter}_" + java.util.UUID.randomUUID().toString.take(8)
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.filter(_.nonEmpty).foreach { b =>
          input.addData(b.toSeq.map(t => ev(1, t, t.toDouble)): _*)
          q.processAllAvailable()
        }
        input.addData(ev(1, 100000, 0.0)) // sentinel flushes the last session
        q.processAllAvailable()
        val got = spark.table(name).collect().map { r =>
          (r.getAs[java.sql.Timestamp]("session_start").getTime / 1000,
            r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
        }.toSet
        assert(got === expected,
          s"iter=$iter ts=$ts batches=${batches.map(_.toSeq)}")
      } finally q.stop()
    }
  }

  test("batch mode with flushTrailing emits every session exactly once") {
    import spark.implicits._
    val events = Seq(
      ev(1, 0, 1.0), ev(1, 30, 2.0), ev(1, 5000, 3.0),
      ev(2, 100, 4.0)).toDS()
    val out = Sessionize.sessions(events, gapUs = 60L * 1000000, flushTrailing = true)
      .collect().sortBy(s => (s.user_id, s.session_start))
    assert(out.map(s => (s.user_id, s.n, s.sum_value)).toSeq ===
      Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }
}
