package graft

import org.scalatest.funsuite.AnyFunSuite

/** q327 DiD and q328 CUPED: plain-Scala replays of both estimators at
  * sf0.001, plus the algebraic invariants that make each adjustment an
  * adjustment — DiD equals the explicit double difference of its own
  * cell means, and CUPED's arm-weighted adjusted means preserve the
  * pooled outcome mean exactly (the unbiasedness identity).
  */
class CausalAdjustSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q327 matches a plain-Scala DiD replay; did = (m11-m10)-(m01-m00)") {
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, cents(r.getDouble(2))))
    val t0 = ev.map(_._2).min
    val t1 = ev.map(_._2).max
    val dd = java.time.temporal.ChronoUnit.DAYS.between(t0, t1)
    val cells = ev.groupBy { case (u, day, _) =>
      (u % 2, if (2 * java.time.temporal.ChronoUnit.DAYS.between(t0, day) >= dd + 1) 1L else 0L)
    }.map { case (k, v) => k -> ((v.size.toLong, v.map(_._3).sum)) }
    def mean(k: (Long, Long)) = cells(k)._2.toDouble / cells(k)._1.toDouble
    val did = (mean((1, 1)) - mean((1, 0))) - (mean((0, 1)) - mean((0, 0)))
    val out = SparkEntry.queries("q327_did_estimator")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.keySet == cells.keySet)
    out.foreach { case (k, (n, c, m, dOut)) =>
      assert((n, c) == cells(k), s"cell $k counts diverge")
      assert(m == mean(k) && dOut == did, s"cell $k means/did diverge")
    }
  }

  test("q328 matches a plain-Scala CUPED replay; adjusted means preserve the pooled mean") {
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, cents(r.getDouble(2))))
    val t0 = ev.map(_._2).min
    def off(day: java.time.LocalDate) = java.time.temporal.ChronoUnit.DAYS.between(t0, day)
    val ux = ev.filter(e => off(e._2) >= 0 && off(e._2) < 21).groupBy(_._1).map {
      case (u, rows) =>
        (u, rows.filter(e => off(e._2) < 14).map(_._3).sum,
          rows.filter(e => off(e._2) >= 14).map(_._3).sum)
    }.toSeq
    val n = ux.size.toLong
    val (sx, sy) = (ux.map(_._2).sum, ux.map(_._3).sum)
    val sxx = ux.map(e => BigInt(e._2) * BigInt(e._2)).sum
    val sxy = ux.map(e => BigInt(e._2) * BigInt(e._3)).sum
    val theta = (BigInt(n) * sxy - BigInt(sx) * BigInt(sy)).toDouble /
      (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble
    val xBar = sx.toDouble / n.toDouble
    val expected = ux.groupBy(_._1 % 2).map { case (t, rows) =>
      val (na, xa, ya) = (rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum)
      t -> ((na, ya, xa, theta, xBar,
        ya.toDouble / na.toDouble - theta * (xa.toDouble / na.toDouble - xBar)))
    }
    val out = SparkEntry.queries("q328_cuped")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out == expected)
    // unbiasedness identity: Σ_arm n_a·adj_a = Σ y exactly in exact
    // arithmetic; assert to float tolerance after the divisions
    val lhs = out.map { case (_, (na, _, _, _, _, adj)) => na.toDouble * adj }.sum
    assert(math.abs(lhs - sy.toDouble) < 1e-6 * math.abs(sy.toDouble),
      s"CUPED broke the pooled mean: $lhs vs $sy")
    // the adjustment is live: theta is not 0 (a zero covariance fixture
    // would make the whole operator a no-op)
    assert(out.values.head._4 != 0.0, "theta = 0 — fixture drift")
  }
}
