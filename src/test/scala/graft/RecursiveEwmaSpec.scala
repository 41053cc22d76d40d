package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q180 / q176 dedicated invariants — the EWMA recurrence triangulated.
  *
  * q180 (recursive SQL, UnionLoop engine path) is re-derived here by an
  * INDEPENDENT daily-grain typed fold (q176's machinery, written fresh)
  * and must agree bit-for-bit on every folded double: together with the
  * DuckDB oracle's join-stepped recursive CTE that makes three
  * independent expressions of the recurrence that all hash-match.
  * q176's own clause checks the recurrence LAW on its output (each
  * ewma is 0.25·n + 0.75·prior; each flag votes against the PRIOR
  * baseline, never its own) rather than re-running the implementation.
  */
class RecursiveEwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  /** Independent daily EWMA fold (not the registered q176 code path). */
  private def foldDaily(): Array[(String, Long, Long, Double, Long)] = {
    import spark.implicits._
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Timestamp, Long)]
    daily.groupByKey(_._1).flatMapGroups { (tpe, it) =>
      val series = it.toArray.sortBy(_._2.getTime)
      var ewma = 0.0
      series.iterator.zipWithIndex.map { case ((_, day, n), i) =>
        val prev = ewma
        ewma = if (i == 0) n.toDouble else 0.25 * n.toDouble + 0.75 * prev
        val anomaly =
          if (i == 0) 0L
          else if (n.toDouble > 2.0 * prev || n.toDouble < 0.5 * prev) 1L
          else 0L
        (tpe, day.getTime, n, ewma, anomaly)
      }
    }.collect().sortBy(t => (t._1, t._2))
  }

  test("q180: recursive SQL equals an independent typed fold bit-for-bit") {
    val rec = SparkEntry.queries("q180_recursive_sql")(spark, d).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val fold = foldDaily()
    assert(rec.length == fold.length, "row-count mismatch vs fold")
    rec.zip(fold).foreach { case (a, b) =>
      assert(a == b, s"recursion row $a != fold row $b (doubles must be identical)")
    }
  }

  test("q180: the plan actually runs the UnionLoop iterative engine path") {
    val df = SparkEntry.queries("q180_recursive_sql")(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"recursive CTE did not plan as UnionLoop:\n$plan")
  }

  test("q180: fixture liveness — multi-step depth and a fired anomaly") {
    val rows = SparkEntry.queries("q180_recursive_sql")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    val perType = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perType.nonEmpty && perType.forall(_._2 >= 2),
      "every series must take at least one recursive step")
    assert(rows.exists(_._2 == 1L),
      "no anomaly fired — the flag branch is dead at this fixture")
  }

  test("q176: output satisfies the recurrence law and flags vote against the prior baseline") {
    val out = SparkEntry.queries("q176_ewma_anomaly")(spark, d).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (tpe, series0) =>
      val series = series0.sortBy(_._2)
      val (_, _, n0, e0, a0) = series.head
      assert(e0 == n0.toDouble && a0 == 0L,
        s"$tpe: first hour must seed ewma = n with no flag")
      series.sliding(2).foreach {
        case Array((_, _, _, prev, _), (_, _, n, e, a)) =>
          assert(e == 0.25 * n.toDouble + 0.75 * prev,
            s"$tpe: recurrence law broken (ewma $e vs ${0.25 * n + 0.75 * prev})")
          val expFlag =
            if (n.toDouble > 2.0 * prev || n.toDouble < 0.5 * prev) 1L else 0L
          assert(a == expFlag, s"$tpe: flag must vote against the PRIOR ewma")
        case _ => ()
      }
    }
    assert(out.exists(_._5 == 1L), "no hourly anomaly fired at this fixture")
  }
}
