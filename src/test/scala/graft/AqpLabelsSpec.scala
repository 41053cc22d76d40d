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

  // q324's differential runs at sf0.01, NOT sf0.001: at sf0.001 every
  // featured user purchased in the outcome week (15/15 label-1, judge-
  // verified in DuckDB), so class 0 is empty and the coalesce-to-0
  // branch — the silent-row-drop bug the operator exists to close —
  // is never exercised. sf0.01 has both classes live (141 vs 9).
  test("q324 matches a window replay; leakage-safe by construction; both classes live") {
    val ev = Tables.events(spark, TestSpark.Sf001)
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
    val out = SparkEntry.queries("q324_leakage_safe_labels")(spark, TestSpark.Sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out == expected)
    // leakage-safety is structural: every feature input predates the
    // cutoff (the replay's filter IS the proof), and the label classes
    // are both populated so a model could actually train
    assert(feat.forall(e => e._2.isBefore(t0.plusDays(14))))
    assert(out.values.exists(_._5 == 1L) && out.values.exists(_._5 == 0L),
      "single-class labels at sf0.01 — fixture drift")
  }

  /** Closed-form window-boundary fixture: the cutoff day (off = 14)
    * must be LABEL-side only, never feature-side — an off-by-one here
    * is exactly the target leakage the operator exists to prevent.
    */
  test("q324 window boundaries: off=14 is label-only, off=13 purchase is not a label") {
    import spark.implicits._
    def ts(off: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(off.toLong).atTime(12, 0))
    // t0 = 2024-01-01 (user 1's off=0 event pins it)
    val rows = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),      // feature (off 0)
      (2L, ts(14), 1L, "purchase", 2.0, "{}"), // cutoff day: label 1, NOT a feature
      (3L, ts(0), 2L, "view", 1.0, "{}"),      // feature
      (4L, ts(13), 2L, "purchase", 3.0, "{}"), // feature-window purchase: NOT a label
      (5L, ts(0), 3L, "view", 1.0, "{}"),      // feature
      (6L, ts(21), 3L, "purchase", 4.0, "{}"), // past outcome window: NOT a label
      (7L, ts(14), 4L, "purchase", 5.0, "{}"), // label-window only: absent entirely
      (8L, ts(13), 5L, "view", 6.0, "{}")      // last feature day: days_since_last 0
    )
    val dir = java.nio.file.Files.createTempDirectory("graft_q324_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q324_leakage_safe_labels")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      1L -> ((1L, 100L, 1L, 13L, 1L)), // off=14 purchase counted as label, not feature
      2L -> ((2L, 400L, 2L, 0L, 0L)),  // off=13 purchase is a feature row, label stays 0
      3L -> ((1L, 100L, 1L, 13L, 0L)), // off=21 purchase outside the outcome window
      5L -> ((1L, 600L, 1L, 0L, 0L))   // coalesce-to-0 branch for a no-outcome user
    ), s"boundary semantics broken: $out")
    assert(!out.contains(4L), "label-window-only user must not enter the feature population")
  }
}
