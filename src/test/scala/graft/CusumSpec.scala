package graft

import org.scalatest.funsuite.AnyFunSuite

/** q302 CUSUM changepoint: independent sequential replay of the
  * scaled statistic C_t = n·prefix_t − total·t in plain Scala over the
  * same events, argmax with earliest-day tiebreak — the distributed
  * window/join/struct-keeper pipeline must agree exactly. Also pins
  * the structural identities: C_n = 0 for every series (the trailing
  * day can never be the break unless the whole series is flat) and
  * the reported abs_cusum is genuinely the max over the replayed
  * curve.
  */
class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q302 equals a sequential CUSUM replay, tiebreak earliest day") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val expected = daily.keys.map(_._1).toSet.map { (tpe: String) =>
      val series = daily.collect { case ((t, day), x) if t == tpe => (day, x) }
        .toSeq.sortBy(_._1)
      val n = series.size.toLong
      val total = series.map(_._2).sum
      var pfx = 0L
      val curve = series.zipWithIndex.map { case ((day, x), i) =>
        pfx += x
        (day, n * pfx - total * (i + 1))
      }
      assert(curve.last._2 == 0L, s"$tpe: C_n must be identically 0")
      val best = curve.minBy { case (day, c) => (-math.abs(c), day) }
      tpe -> ((n, best._1, best._2, math.abs(best._2)))
    }.toMap
    val got = SparkEntry.queries("q302_cusum_changepoint")(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDate(2).toString, r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected, s"CUSUM replay diverged:\n got $got\n exp $expected")
  }
}
