package graft

import org.scalatest.funsuite.AnyFunSuite

/** q320 multi-touch differential: replay the 7-day window join, the
  * U-shaped 40/20/40 integer micro-credit assignment (remainder to the
  * first touch), and the rollup in plain Scala; pin CONSERVATION — every
  * purchase distributes exactly 1 000 000 micro-shares, so the total
  * attributed value equals the total purchase value to the cent.
  */
class MultiTouchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q320 matches a plain-Scala U-shaped replay; credits conserve exactly") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "event_id", "user_id", "ts",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getLong(4)))
    val purchases = ev.filter(_._1 == "purchase")
    val touches = ev.filter(e => e._1 == "view" || e._1 == "click")
    case class Credit(touchType: String, pid: Long, micros: Long, cents: Long)
    val credits = purchases.flatMap { case (_, pid, u, pts, cents) =>
      // Instant comparison keeps sub-millisecond precision — a ms-grain
      // getTime replay could flip boundary rows the engines keep
      val pi = pts.toInstant
      val lo = pi.minus(java.time.Duration.ofDays(7))
      val win = touches.filter { t =>
        val ti = t._4.toInstant
        t._3 == u && !ti.isAfter(pi) && !ti.isBefore(lo)
      }.sortBy(t => (t._4.toInstant.getEpochSecond, t._4.toInstant.getNano, t._2))
      val n = win.length
      if (n == 0) Seq(Credit("none", pid, 1000000L, cents))
      else if (n == 1) Seq(Credit(win.head._1, pid, 1000000L, cents))
      else {
        val mid = if (n > 2) 200000L / (n - 2) else 0L
        val rem = 200000L - mid * (n - 2)
        win.zipWithIndex.map { case (t, i) =>
          val c = if (i == 0) 400000L + rem
            else if (i == n - 1) 400000L else mid
          Credit(t._1, pid, c, cents)
        }.toSeq
      }
    }
    // conservation: each purchase hands out exactly one million micros
    credits.groupBy(_.pid).foreach { case (pid, cs) =>
      assert(cs.map(_.micros).sum == 1000000L, s"purchase $pid leaks credit")
    }

    val expected = credits.groupBy(_.touchType).map { case (tt, cs) =>
      tt -> ((cs.length.toLong, cs.map(_.pid).distinct.length.toLong,
        cs.map(c => BigInt(c.micros) * c.cents).sum.toDouble / 1e6))
    }
    val out = SparkEntry.queries("q320_multitouch_attribution")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == expected)

    // global conservation, to the exact cent
    val attributed = expected.values.map(_._3).sum
    val totalCents = purchases.map(_._5).sum.toDouble
    assert(math.abs(attributed - totalCents) < 1e-6,
      s"attributed $attributed vs purchase total $totalCents")
  }
}
