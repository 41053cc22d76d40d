package graft

import org.scalatest.funsuite.AnyFunSuite

/** q326 session paths: a full plain-Scala replay of the 30-minute-gap
  * sessionization and path extraction at sf0.001, plus a closed-form
  * boundary fixture pinning that a gap of EXACTLY 1800 s does NOT open a
  * new session (the predicate is gap > 1800) while 1801 s does.
  */
class SessionPathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q326 equals a plain-Scala sessionization replay at sf0.001") {
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._4)).toSeq
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // second-truncated gap, matching unix_timestamp/date_diff('second')
          if (b._3.getTime / 1000 - a._3.getTime / 1000 > 1800) {
            sessions += scala.collection.mutable.ArrayBuffer(b)
          } else sessions.last += b
        case _ =>
      }
      sessions.map(s => s.take(3).map(_._2).mkString(">"))
    }
    val expected = paths.groupBy(identity).map { case (p, v) => p -> v.length.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val out = SparkEntry.queries("q326_session_paths")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == expected, s"top-10 paths diverge:\n got $out\n exp $expected")
  }

  test("q326 gap boundary: exactly 1800 s continues a session; 1801 s breaks it") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(1800), 1L, "click", 0.0, "{}"),    // gap = 1800 → same session
      (3L, ts(1800 + 1801), 1L, "purchase", 0.0, "{}")) // gap = 1801 → new session
    val dir = java.nio.file.Files.createTempDirectory("graft_q326_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q326_session_paths")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 1L, "purchase" -> 1L),
      s"30-min boundary semantics broken: $out")
  }
}
