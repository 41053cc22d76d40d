package graft

import org.scalatest.funsuite.AnyFunSuite

/** q336 MA crossover and q337 Pareto cut: plain-Scala replays plus the
  * properties that make each signal a signal — crossovers alternate in
  * direction within a type (two consecutive golden crosses would mean a
  * missed death cross), both frames are full at every fire, and the
  * Pareto cut is the MINIMAL prefix covering 80 % (one fewer user drops
  * below, the cut itself reaches it).
  */
class CrossoverParetoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q336 equals a plain-Scala replay; directions alternate; frames full") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, cents(r.getDouble(2))))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val daily = rows.groupBy(_._2).map { case (day, v) => (day, v.map(_._3).sum) }
        .toSeq.sortBy(_._1.toEpochDay)
      val sums = daily.indices.map { i =>
        val s3 = daily.slice(math.max(0, i - 2), i + 1).map(_._2).sum
        val s7 = daily.slice(math.max(0, i - 6), i + 1).map(_._2).sum
        (daily(i)._1, i + 1, s3, s7,
          if (7 * s3 > 3 * s7) 1 else if (7 * s3 < 3 * s7) -1 else 0)
      }
      sums.sliding(2).collect {
        case Seq((_, _, _, _, prev), (day, rn, s3, s7, sgn))
          if rn >= 7 && sgn != prev && sgn != 0 =>
          (t, day) -> ((if (sgn == 1) "golden" else "death", s3, s7))
      }
    }.toMap
    val out = SparkEntry.queries("q336_ma_crossover")(spark, d).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == expected, "crossover replay diverges")
    assert(out.nonEmpty, "no crossovers at sf0.001 — signal vacuous")
    // within a type, consecutive fired crossings alternate direction
    out.toSeq.groupBy(_._1._1).values.foreach { xs =>
      val dirs = xs.sortBy(_._1._2.toEpochDay).map(_._2._1)
      dirs.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"two consecutive $a crosses")
        case _ =>
      }
    }
  }

  test("q337 equals a plain-Scala replay; the cut is minimal and sufficient") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val byUser = rows.groupBy(_._2).map { case (u, v) => (u, v.map(_._3).sum) }
        .toSeq.sortBy { case (u, c) => (-c, u) }
      val tot = byUser.map(_._2).sum
      var cum = 0L
      val inside = byUser.takeWhile { case (_, c) => val in = 5 * cum < 4 * tot; cum += c; in }
      t -> ((byUser.size.toLong, inside.size.toLong, inside.map(_._2).sum, tot,
        inside.map(_._2).sum.toDouble / tot.toDouble))
    }
    val out = SparkEntry.queries("q337_pareto_cut")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out == expected, "pareto replay diverges")
    out.foreach { case (t, (nUsers, nTop, topCents, tot, _)) =>
      assert(5 * topCents >= 4 * tot, s"$t: cut does not reach 80%")
      assert(nTop < nUsers, s"$t: cut is the whole population — concentration vacuous")
    }
    // minimality: dropping the cut's last (smallest) member falls below 80%
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val byUser = rows.groupBy(_._2).map { case (u, v) => (u, v.map(_._3).sum) }
        .toSeq.sortBy { case (u, c) => (-c, u) }
      val nTop = out(t)._2.toInt
      val without = byUser.take(nTop - 1).map(_._2).sum
      assert(5 * without < 4 * out(t)._4, s"$t: cut is not minimal")
    }
  }
}
