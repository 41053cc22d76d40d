package graft

import org.scalatest.funsuite.AnyFunSuite

/** q139/q140 differential contracts against plain-Scala recomputations of
  * the funnel and the retention matrix — independent of both Spark's and
  * DuckDB's SQL semantics. The funnel test also pins the ORDERING
  * property that separates a funnel from three independent mins: every
  * reported click_ts strictly follows the view_ts, every purchase_ts
  * strictly follows the click_ts.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val events: Array[(Long, String, java.sql.Timestamp)] =
    Tables.events(spark, d)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts")))

  test("q139: funnel stages match a sequential plain-Scala replay") {
    val byUser = events.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      def firstAfter(tpe: String, after: Option[java.sql.Timestamp]) =
        after.flatMap { t =>
          val cand = rows.filter(r => r._2 == tpe && r._3.after(t)).map(_._3)
          if (cand.isEmpty) None else Some(cand.min)
        }
      val view = {
        val vs = rows.filter(_._2 == "view").map(_._3)
        if (vs.isEmpty) None else Some(vs.min)
      }
      view.map { v =>
        val click = firstAfter("click", Some(v))
        val buy = firstAfter("purchase", click)
        u -> ((v, click, buy, 1L + click.size + buy.size))
      }
    }

    val out = SparkEntry.queries("q139_funnel")(spark, d).collect().map { r =>
      r.getAs[Long]("user_id") ->
        ((r.getAs[java.sql.Timestamp]("view_ts"),
          Option(r.getAs[java.sql.Timestamp]("click_ts")),
          Option(r.getAs[java.sql.Timestamp]("purchase_ts")),
          r.getAs[Long]("stage")))
    }.toMap

    assert(out.keySet == expected.keySet)
    expected.foreach { case (u, (v, c, b, stage)) =>
      val (ov, oc, ob, ostage) = out(u)
      assert(ov == v && oc == c && ob == b && ostage == stage, s"user $u drifted")
      oc.foreach(t => assert(t.after(ov), s"user $u click not after view"))
      (oc, ob) match {
        case (Some(ct), Some(bt)) => assert(bt.after(ct), s"user $u purchase not after click")
        case (None, Some(_)) => fail(s"user $u purchased without clicking")
        case _ =>
      }
    }
    // the corpus is dense — every user converts (checked, not assumed);
    // the partial-funnel paths are exercised by the fixture test below
    assert(expected.values.forall(_._4 == 3L))
  }

  test("q139: partial funnels and out-of-order events on a closed-form fixture") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1 full funnel; u2 stops after click; u3 only views; u4's click
    // PRECEDES its view (must not count — the ordering property); u5 has
    // no view at all (excluded); u6 purchases before clicking (stage 2:
    // the purchase must not count even though one exists after the view)
    val rows = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "view", t(1)), (2L, "click", t(5)),
      (3L, "view", t(4)),
      (4L, "click", t(1)), (4L, "view", t(2)),
      (5L, "purchase", t(1)),
      (6L, "view", t(1)), (6L, "purchase", t(2)), (6L, "click", t(3)))
    val out = queries.Behavior.funnelOf(
      rows.toDF("user_id", "event_type", "ts"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 6L -> 2L))
  }

  test("q148: transition matrix matches a sequential replay; rows are stochastic") {
    val byUser = Tables.events(spark, d)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id")))
      .groupBy(_._1)
    implicit val tsOrd: Ordering[java.sql.Timestamp] = Ordering.comparatorToOrdering(
      java.util.Comparator.naturalOrder[java.sql.Timestamp]())
    val counts = byUser.values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      ordered.zip(ordered.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val out = SparkEntry.queries("q148_event_transitions")(spark, d).collect().map { r =>
      (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))
    }.toMap
    assert(out.view.mapValues(_._1).toMap == counts)
    // probability definition and row-stochastic identity
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    out.foreach { case ((f, _), (n, p)) => assert(p == n.toDouble / totals(f)) }
    totals.keys.foreach { f =>
      val rowSum = out.collect { case ((`f`, _), (_, p)) => p }.sum
      assert(math.abs(rowSum - 1.0) < 1e-9, s"row $f not stochastic: $rowSum")
    }
    // mass: one transition per consecutive pair
    assert(out.values.map(_._1).sum ==
      byUser.values.map(_.size.toLong - 1).sum)
  }

  test("q149: last-touch attribution matches a replay and conserves purchases") {
    val evs = Tables.events(spark, d)
      .select("user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
    val expected = evs.filter(_._2 == "purchase").map { case (u, _, ts, v) =>
      val touch = evs.filter(e => e._1 == u && (e._2 == "view" || e._2 == "click")
        && !e._3.after(ts)).sortBy(_._3).lastOption
      (touch.map(_._2).getOrElse("none"), v)
    }
    val expByType = expected.groupBy(_._1).view.mapValues { vs =>
      (vs.length.toLong,
        vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }.toMap

    val out = SparkEntry.queries("q149_attribution")(spark, d).collect().map { r =>
      r.getAs[String]("touch_type") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value")))
    }.toMap
    assert(out == expByType)
    assert(out.values.map(_._1).sum == evs.count(_._2 == "purchase"),
      "attribution must conserve the purchase count")
  }

  test("q140: retention matrix matches a plain-Scala recomputation") {
    def day(t: java.sql.Timestamp): Long =
      t.toLocalDateTime.toLocalDate.toEpochDay
    val first = events.groupBy(_._1).view.mapValues(rs => day(rs.map(_._3).min)).toMap
    val expected = events.map(r => (first(r._1), day(r._3) - first(r._1), r._1))
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap

    val out = SparkEntry.queries("q140_cohort_retention")(spark, d).collect().map { r =>
      (r.getAs[java.sql.Date]("cohort_day").toLocalDate.toEpochDay,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("active_users")
    }.toMap

    assert(out == expected)
    // offset 0 row per cohort: a user is always active on their first day
    val cohorts = first.values.toSet
    cohorts.foreach(c => assert(out.contains((c, 0L)), s"cohort $c missing day-0 row"))
    // mass conservation: summing the matrix counts every (user, day) once
    assert(out.values.sum == events.map(r => (r._1, day(r._3))).distinct.length)
  }
}
