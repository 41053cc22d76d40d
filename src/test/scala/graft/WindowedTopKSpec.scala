package graft

import org.scalatest.funsuite.AnyFunSuite

/** q291 running bounded top-k OVER a window frame — the typed
  * `Aggregator`-as-window-function cell. Differential: replay the
  * running top-3 per user in plain Scala (sort each user's history by
  * (ts, event_id), fold forward keeping the 3 best (−value, id) pairs)
  * and require exact agreement, including the NULL cells before a user
  * has 3 events and tie-breaks toward the smaller event_id.
  */
class WindowedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q291 matches a plain-Scala running top-3 replay exactly") {
    val evs = Tables.events(spark, d)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))

    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      // full-precision ordering key: Timestamp.getTime truncates to ms,
      // and a sub-millisecond pair whose event_id order opposes its
      // micro-ts order would sort differently from the query's (ts,
      // event_id) window order
      val ordered = rows.toSeq.sortBy(r =>
        (r._2.toInstant.getEpochSecond, r._2.toInstant.getNano, r._3))
      var best = List.empty[(Double, Long)] // (value, id), kept best-first
      ordered.map { case (u, ts, id, v) =>
        best = ((v, id) :: best).sortBy { case (s, i) => (-s, i) }.take(3)
        def cell(i: Int): (Option[Long], Option[Double]) =
          if (best.size > i) (Some(best(i)._2), Some(best(i)._1)) else (None, None)
        val (i1, v1) = cell(0); val (i2, v2) = cell(1); val (i3, v3) = cell(2)
        (u, ts.getTime, id) -> ((i1, v1, i2, v2, i3, v3))
      }
    }

    val out = SparkEntry.queries("q291_running_topk")(spark, d).collect().map { r =>
      def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id")) ->
        ((optL(3), optD(4), optL(5), optD(6), optL(7), optD(8)))
    }.toMap

    assert(out.size == evs.length, "one output row per event")
    assert(out == expected.toMap)
  }
}
