package graft

import org.scalatest.funsuite.AnyFunSuite

/** q329 day-of-week seasonality: plain-Scala replay (ISO weekday, exact
  * division-last index) plus the conservation identity — per type, the
  * n-weighted mean of seasonal indices is exactly 1 in exact arithmetic
  * (Σ_dow n_dow·idx_dow·cents_all/n_all = Σ cents_dow = cents_all).
  */
class SeasonalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q329 matches a plain-Scala replay; indices n-weighted-average to 1") {
    val ev = Tables.events(spark, d)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfWeek.getValue.toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val byDow = ev.groupBy(e => (e._1, e._2))
      .map { case (k, v) => k -> ((v.size.toLong, v.map(_._3).sum)) }
    val tot = ev.groupBy(_._1).map { case (t, v) => t -> ((v.size.toLong, v.map(_._3).sum)) }
    val expected = byDow.map { case ((t, dow), (n, c)) =>
      val (nAll, cAll) = tot(t)
      (t, dow) -> ((n, c,
        (BigInt(c) * BigInt(nAll)).toDouble / (BigInt(n) * BigInt(cAll)).toDouble))
    }
    val out = SparkEntry.queries("q329_dow_seasonality")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == expected)
    tot.keys.foreach { t =>
      val (nAll, _) = tot(t)
      val wavg = out.collect { case ((`t`, _), (n, _, idx)) => n.toDouble * idx }.sum / nAll
      assert(math.abs(wavg - 1.0) < 1e-9, s"$t: weighted index mean $wavg != 1")
    }
    // all 7 ISO weekdays present for every type (the 30-day fixture
    // covers 4+ of each) — otherwise the index table has silent holes
    assert(out.keys.groupBy(_._1).values.forall(_.size == 7),
      "missing weekday cells at sf0.001 — fixture drift")
  }
}
