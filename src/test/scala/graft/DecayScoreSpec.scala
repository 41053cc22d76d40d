package graft

import org.scalatest.funsuite.AnyFunSuite

/** q317 decay-score differential: replay the integer half-life
  * staircase (k = ⌈age/7⌉, term = cents·2^(30−k), one closing division)
  * in plain Scala BigInt arithmetic and require exact agreement; pin
  * the decay semantics — monotone in age, exactly halved per
  * half-life step, zero beyond the 30-step truncation.
  */
class DecayScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q317 matches a BigInt staircase replay; weights halve per step and truncate") {
    val rows = Tables.events(spark, d)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val horizon = rows.map(_._2).max

    val expected = rows.groupBy(_._1).map { case (tpe, rs) =>
      val scaled = rs.map { case (_, day, cents) =>
        val k = (java.time.temporal.ChronoUnit.DAYS.between(day, horizon) + 6) / 7
        if (k <= 30) BigInt(cents) << (30 - k).toInt else BigInt(0)
      }.sum
      tpe -> ((rs.length.toLong, scaled.toDouble / 1073741824.0))
    }

    val out = SparkEntry.queries("q317_decay_score")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == expected)

    // the staircase itself: weight(k) is exactly half of weight(k-1),
    // and age 211+ days (k > 30) contributes exactly zero
    def w(k: Long): BigInt = if (k <= 30) BigInt(1) << (30 - k).toInt else BigInt(0)
    (1L to 30L).foreach(k => assert(w(k) * 2 == w(k - 1), s"step $k not a halving"))
    assert(w(31) == 0 && w(100) == 0)
    // fixture liveness: more than one decay step is actually exercised
    val ks = rows.map(r => (java.time.temporal.ChronoUnit.DAYS.between(r._2, horizon) + 6) / 7)
    assert(ks.distinct.size > 1, "all events in one half-life bucket — decay untested")
  }
}
