package graft

import org.scalatest.funsuite.AnyFunSuite

/** q332 Wilson scorecard: plain-Scala replay with the identical IEEE op
  * sequence, plus the interval laws — bounds inside [0,1], the observed
  * rate inside its own interval, and degenerate slices (p = 0 or 1)
  * still produce a strictly positive-width interval (the reason Wilson
  * replaces the normal interval on eval dashboards).
  */
class WilsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q332 equals a plain-Scala replay; interval laws hold") {
    val docs = Tables.documents(spark, d)
      .selectExpr("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(e => (e._1, e._2)).map { case ((l, src), rows) =>
      val n = rows.length.toLong
      val k = rows.count(_._3 >= 200).toLong
      val nd = n.toDouble
      val p = k.toDouble / nd
      val z2 = 1.96 * 1.96
      val center = (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
      val half = (1.96 * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))) /
        (1.0 + z2 / nd)
      (l, src) -> ((n, k, p, center - half, center + half))
    }
    val out = SparkEntry.queries("q332_wilson_scorecard")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out == expected, "Wilson replay diverges")
    out.values.foreach { case (_, _, p, lo, hi) =>
      assert(lo >= 0.0 - 1e-12 && hi <= 1.0 + 1e-12, s"bounds escape [0,1]: $lo $hi")
      // 1-ulp tolerance: at p = 1 the algebra gives hi ≡ 1 exactly but
      // the float op sequence lands at 1 − 1ulp (0.999…9); same at p = 0
      assert(lo <= p + 1e-9 && p <= hi + 1e-9,
        s"observed rate outside its interval: $lo $p $hi")
      assert(hi - lo > 0.0, "zero-width interval")
    }
  }
}
