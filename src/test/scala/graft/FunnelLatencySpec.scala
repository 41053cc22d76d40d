package graft

import org.scalatest.funsuite.AnyFunSuite

/** q335 funnel latency: plain-Scala replay on top of q139's own funnel
  * semantics (shared funnelOf — the two views cannot disagree), plus the
  * rank-selection laws: p50/p90 are members of the latency multiset,
  * p50 ≤ p90, and counts equal q139's converting populations.
  */
class FunnelLatencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q335 equals a plain-Scala replay; percentiles are members; counts match q139") {
    val f = SparkEntry.queries("q139_funnel")(spark, d).collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3))))
    def secs(a: java.sql.Timestamp, b: java.sql.Timestamp): Long =
      b.getTime / 1000 - a.getTime / 1000
    val lat = Map(
      "view_to_click" -> f.collect { case (u, Some(v), Some(c), _) => (u, secs(v, c)) },
      "click_to_purchase" -> f.collect { case (u, _, Some(c), Some(p)) => (u, secs(c, p)) })
    val expected = lat.map { case (stage, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1)).map(_._2)
      val n = sorted.length.toLong
      stage -> ((n, sorted(((n + 1) / 2).toInt - 1), sorted(((9 * n + 9) / 10).toInt - 1),
        sorted.sum.toDouble / n.toDouble))
    }
    val out = SparkEntry.queries("q335_funnel_latency")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out == expected, s"latency replay diverges:\n got $out\n exp $expected")
    out.foreach { case (stage, (n, p50, p90, _)) =>
      val ms = lat(stage).map(_._2)
      assert(ms.contains(p50) && ms.contains(p90), s"$stage: percentile not a member")
      assert(p50 <= p90, s"$stage: p50 > p90")
      assert(n == ms.length.toLong, s"$stage: count diverges from q139's population")
    }
  }
}
