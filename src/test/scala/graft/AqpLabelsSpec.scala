package graft

import org.scalatest.funsuite.AnyFunSuite

/** q323/q324 differentials. q323: replay the hash sample and the ×16
  * scale-up in plain Scala, pin that the sample is genuinely ~1/16 and
  * the realized error is small for counts; q324: replay the two
  * temporal windows, pin structural leakage-safety (no feature input
  * postdates the cutoff) and that both label classes are populated.
  */
class AqpLabelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q323 matches a plain-Scala sample replay; sample rate ≈ 1/16") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      md.reset()
      val hex = md.digest(s"aqp|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "event_id", "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (tpe, rows) =>
      val samp = rows.filter(r => h(r._2) % 16 == 0)
      val exact = rows.map(_._3).sum
      val est = samp.map(_._3).sum * 16
      tpe -> ((rows.length.toLong, samp.length.toLong, samp.length.toLong * 16,
        exact, est, math.abs(est - exact).toDouble / exact.toDouble))
    }
    val out = SparkEntry.queries("q323_aqp_sample_audit")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out == expected)
    val (n, ns) = (ev.length, ev.count(r => h(r._2) % 16 == 0))
    assert(ns > 0 && math.abs(ns.toDouble / n - 1.0 / 16) < 0.03,
      s"sample rate ${ns.toDouble / n} far from 1/16 — hash draw broken")
  }

  test("q324 matches a window replay; leakage-safe by construction; both classes live") {
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "event_type",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2), r.getLong(3)))
    val t0 = ev.map(_._2).min
    def off(day: java.time.LocalDate): Long =
      java.time.temporal.ChronoUnit.DAYS.between(t0, day)
    val feat = ev.filter(e => off(e._2) >= 0 && off(e._2) < 14)
    val outw = ev.filter(e => off(e._2) >= 14 && off(e._2) < 21 && e._3 == "purchase")
      .map(_._1).toSet
    val expected = feat.groupBy(_._1).map { case (u, rows) =>
      u -> ((rows.length.toLong, rows.map(_._4).sum,
        rows.map(_._2).distinct.length.toLong,
        13L - rows.map(e => off(e._2)).max,
        if (outw(u)) 1L else 0L))
    }
    val out = SparkEntry.queries("q324_leakage_safe_labels")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out == expected)
    // leakage-safety is structural: every feature input predates the
    // cutoff (the replay's filter IS the proof), and the label classes
    // are both populated so a model could actually train
    assert(feat.forall(e => e._2.isBefore(t0.plusDays(14))))
    assert(out.values.exists(_._5 == 1L) && out.values.exists(_._5 == 0L),
      "single-class labels at sf0.001 — fixture drift")
  }
}
