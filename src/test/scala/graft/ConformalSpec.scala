package graft

import org.scalatest.funsuite.AnyFunSuite

/** q312 split-conformal differential: replay the hash split, the
  * rank-selected per-type median, the ⌈(n+1)(1−α)⌉ threshold, and the
  * test-split coverage in plain Scala and require exact agreement; pin
  * the conformal properties the oracle equality can't express — q̂ is a
  * MEMBER of the calibration score multiset (never interpolated), and
  * empirical coverage sits near the 1−α = 0.9 promise.
  */
class ConformalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q312 matches a plain-Scala conformal replay; q̂ is rank-selected; coverage ≈ 0.9") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "event_id", "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val expected = ev.groupBy(_._1).map { case (tpe, rows) =>
      val cal = rows.filter(_._2 % 5 == 0)
      val tst = rows.filter(_._2 % 5 == 1)
      val sortedCal = cal.sortBy(r => (r._3, r._2))
      val n = cal.length.toLong
      val med = sortedCal(((n + 1) / 2).toInt - 1)._3
      val scores = cal.map(r => (math.abs(r._3 - med), r._2)).sortBy(identity)
      val qhat = scores((((n + 1) * 9 + 9) / 10).toInt - 1)._1
      val covered = tst.count(r => math.abs(r._3 - med) <= qhat).toLong
      tpe -> ((n, tst.length.toLong, med, qhat, covered,
        covered.toDouble / tst.length.toDouble))
    }

    val out = SparkEntry.queries("q312_conformal_coverage")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out == expected)

    out.foreach { case (tpe, (nCal, nTest, _, qhat, _, coverage)) =>
      assert(nCal > 0 && nTest > 0, s"$tpe: degenerate split")
      // q̂ must be an actual calibration score (rank-selected membership)
      val tpeRows = ev.filter(_._1 == tpe)
      val cal = tpeRows.filter(_._2 % 5 == 0)
      val med = cal.sortBy(r => (r._3, r._2)).apply(((cal.length + 1) / 2) - 1)._3
      assert(cal.exists(r => math.abs(r._3 - med) == qhat),
        s"$tpe: q̂=$qhat is not a member of the calibration scores")
      // finite-sample coverage near the promise (exact ≥ 1−α holds in
      // expectation over splits; this deterministic split should land
      // well inside a generous band)
      assert(coverage >= 0.8 && coverage <= 1.0, s"$tpe: coverage $coverage off-promise")
    }
  }
}
