package graft

import org.scalatest.funsuite.AnyFunSuite

/** q333 leaderboard churn: plain-Scala replay of the daily top-10 and
  * consecutive-day Jaccard at sf0.001, plus liveness — churn must be
  * strictly between 0 and 1 somewhere (all-identical or all-disjoint
  * leaderboards would make the stability metric vacuous) and every
  * consecutive day pair must appear exactly once.
  */
class LeaderboardChurnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q333 equals a plain-Scala replay; churn is live; day spine complete") {
    val ev = Tables.events(spark, d)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS cents").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val tops = ev.groupBy(e => (e._1, e._2))
      .map { case ((day, u), v) => (day, u, v.map(_._3).sum) }
      .groupBy(_._1).map { case (day, rows) =>
        day -> rows.toSeq.sortBy(r => (-r._3, r._2)).take(10).map(_._2).toSet
      }
    val days = tops.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val expected = days.sliding(2).collect {
      case Seq(a, b) if b == a.plusDays(1) =>
        val (sa, sb) = (tops(a), tops(b))
        val o = (sa intersect sb).size.toLong
        a -> ((b, sa.size.toLong, sb.size.toLong, o,
          o.toDouble / (sa.size + sb.size - o).toDouble))
    }.toMap
    val out = SparkEntry.queries("q333_leaderboard_churn")(spark, d).collect()
      .map(r => r.getDate(0).toLocalDate -> ((r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == expected, "churn table diverges from the replay")
    // the fixture's 30 consecutive days must yield 29 pairs
    assert(out.size == days.size - 1, s"day spine incomplete: ${out.size}")
    val js = out.values.map(_._5)
    assert(js.exists(j => j > 0.0 && j < 1.0),
      "every day pair fully churns or never churns — stability metric vacuous")
  }
}
