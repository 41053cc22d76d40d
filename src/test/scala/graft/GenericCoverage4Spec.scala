package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fourth batch of dedicated invariant specs for generic-gates-only
  * queries — the STATEFUL-STREAMING set (r13 verdict task 2 priority):
  * doubled-stream dedup totality, interval-join pair laws, file-sink
  * closed-window equality, native session-window gap/sealing laws,
  * initial-state bootstrap decomposition, and the dynamic session gap's
  * partition + liveness properties.
  */
class GenericCoverage4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q64: the doubled stream dedups to exactly one copy of every event") {
    val ids = run("q64_stream_dedup").select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "duplicate event_id survived the dedup")
    val n = Tables.events(spark, d).count()
    assert(ids.length == n, s"totality: ${ids.length} deduped rows vs $n events")
  }

  test("q74: every pair obeys the interval/order laws; no pair emits twice") {
    val rows = run("q74_stream_interval_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))
    assert(rows.nonEmpty, "no interval pairs at sf0.001")
    rows.foreach { case (_, idA, idB, tsA, tsB) =>
      assert(idA < idB, "pair orientation must be id order")
      assert(math.abs(tsB - tsA) <= 5 * 60 * 1000L, "pair outside the 5-minute interval")
    }
    val keys = rows.map(r => (r._2, r._3))
    assert(keys.length == keys.distinct.length, "a pair emitted more than once")
  }

  test("q78: the file sink holds exactly the batch hourly rollup of CLOSED windows") {
    val out = run("q78_stream_file_sink").collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val maxTs = Tables.events(spark, d).agg(max(col("ts"))).head().getTimestamp(0).getTime
    val exp = Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum2(col("value")).as("sv"))
      .collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .filter { case ((h, _), _) => h + 3600 * 1000L <= maxTs - 3600 * 1000L }
      .toMap
    assert(out == exp, s"sink (${out.size} windows) != batch closed-window rollup (${exp.size})")
  }

  test("q205: sessions are sealed, well-formed, and separated by more than the gap") {
    val rows = run("q205_stream_session_window").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3)))
    assert(rows.nonEmpty)
    val maxTs = Tables.events(spark, d).agg(max(col("ts"))).head().getTimestamp(0).getTime
    val gap = 15 * 60 * 1000L
    rows.foreach { case (_, start, last, n) =>
      assert(start <= last && n >= 1L, "malformed session")
      assert(last + gap <= maxTs - 3600 * 1000L - 1000L,
        "an unsealed session leaked into append output")
    }
    rows.groupBy(_._1).foreach { case (u, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 - a._3 > gap,
            s"user $u sessions closer than the 15-minute gap — they should have merged")
        case _ => ()
      }
    }
  }

  test("q225: bootstrap totals decompose as history + stream for every emitted user") {
    val cutoff = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val out = run("q225_tws_initial_state").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val per = Tables.events(spark, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("all_n"),
        sum(when(col("ts") >= lit(cutoff), 1L).otherwise(0L)).as("stream_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val streaming = per.filter(_._3 > 0)
    assert(out.keySet == streaming.map(_._1).toSet,
      "emitted users must be exactly those with post-cutoff events")
    streaming.foreach { case (u, allN, _) =>
      assert(out(u) == allN, s"user $u: n=${out(u)} != history+stream total $allN")
    }
    // liveness: the bootstrap must be visible — some user's total
    // exceeds what the stream alone carries
    assert(streaming.exists { case (u, allN, streamN) => allN > streamN && out(u) == allN },
      "no user shows history contribution — initial state bootstrap untested")
  }

  test("q231: dynamic-gap sessions partition the events and outnumber a uniform 30-min gap") {
    val rows = run("q231_dynamic_session_gap").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3)))
    val nEvents = Tables.events(spark, d).count()
    assert(rows.map(_._4).sum == nEvents,
      "session member counts must partition the event stream")
    rows.groupBy(_._1).foreach { case (u, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 >= a._3, s"user $u sessions overlap")
        case _ => ()
      }
    }
    val uniform = Tables.events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    assert(rows.length > uniform,
      s"dynamic gap produced ${rows.length} sessions, not more than uniform-30min $uniform — " +
        "the 10-minute view gap is dead at this fixture")
  }
}
