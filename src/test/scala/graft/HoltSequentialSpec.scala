package graft

import org.scalatest.funsuite.AnyFunSuite

/** q338 Holt trend and q339 sequential monitoring: plain-Scala replays,
  * plus the semantics each exists for — q338's trend state goes NEGATIVE
  * somewhere (the truncating-division parity is exercised, not vacuous)
  * and its forecast equals level+trend; q339's OBF boundary strictly
  * decreases to ~the fixed-horizon bar at the final look, and early
  * boundaries are far stricter than 1.96.
  */
class HoltSequentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q338 equals a plain-Scala Holt replay; negative trend exercised; forecast = level+trend") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, cents(r.getDouble(2))))
    val expected = ev.groupBy(_._1).flatMap { case (t, rows) =>
      val daily = rows.groupBy(_._2).map { case (day, v) => (day, v.map(_._3).sum) }
        .toSeq.sortBy(_._1.toEpochDay)
      var level = 0L; var trend = 0L
      daily.zipWithIndex.map { case ((day, x), i) =>
        if (i == 0) { level = x; trend = 0L }
        else {
          val prev = level
          level = (x + (level + trend)) / 2L
          trend = (trend + (level - prev)) / 2L
        }
        (t, day) -> ((x, level, trend, level + trend))
      }
    }
    val out = SparkEntry.queries("q338_holt_trend")(spark, d).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == expected.toMap, "Holt replay diverges")
    assert(out.values.exists(_._3 < 0L),
      "trend never negative at sf0.001 — the truncation-parity claim is vacuous")
    out.values.foreach { case (_, l, t, f) => assert(f == l + t) }
  }

  test("q339: boundary decreases to ~fixed-horizon at the last look; early looks stricter") {
    val out = SparkEntry.queries("q339_sequential_monitor")(spark, d).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        Option(r.get(6)).map(_ => r.getDouble(6)), r.getDouble(7), r.getBoolean(8))))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val bounds = out.map(_._2._4).toSeq
    bounds.sliding(2).foreach {
      case Seq(a, b) => assert(a > b, "OBF boundary must strictly decrease")
      case _ =>
    }
    assert(math.abs(bounds.last - 2.963) < 1e-9,
      s"final-look boundary ${bounds.last} != c at information fraction 1")
    assert(bounds.head > 2 * 1.96, "first-look boundary not meaningfully stricter than 1.96")
    // cumulative counts are monotone
    val cn = out.map(x => x._2._1 + x._2._2).toSeq
    cn.sliding(2).foreach { case Seq(a, b) => assert(b > a); case _ => }
    // the z statistic exists from day 1 on this fixture (purchases day 1)
    assert(out.forall(_._2._3.isDefined), "unexpected NULL z — zero pooled variance")
  }
}
