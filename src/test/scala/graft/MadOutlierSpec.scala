package graft

import org.scalatest.funsuite.AnyFunSuite

/** q157 MAD differential: recompute the rank-selected per-type median,
  * the rank-selected median absolute deviation, and the 3×MAD flag in
  * plain Scala and require the exact flagged set (ids AND carried
  * med/mad doubles). Completeness is checked both ways: every flagged
  * row exceeds the threshold, every unflagged row does not.
  */
class MadOutlierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q157 matches a plain-Scala median/MAD replay") {
    val evs = Tables.events(spark, d)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))

    // rank-selected member at position ceil(n/2) in (key, id) order
    def rankMedian[A](rows: Seq[(Long, Double)]): Double = {
      val sorted = rows.sortBy(r => (r._2, r._1))
      sorted(((sorted.length + 1) / 2) - 1)._2
    }

    val expected = evs.toSeq.groupBy(_._2).flatMap { case (tpe, rows) =>
      val med = rankMedian(rows.map(r => (r._1, r._3)))
      val devs = rows.map(r => (r._1, math.abs(r._3 - med)))
      val mad = rankMedian(devs)
      rows.zip(devs).collect {
        case ((id, _, v), (_, dev)) if dev > 3.0 * mad =>
          id -> ((tpe, v, med, mad))
      }.toSeq
    }

    val got = SparkEntry.queries("q157_mad_outliers")(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") -> ((r.getAs[String]("event_type"),
        r.getAs[Double]("value"), r.getAs[Double]("med"), r.getAs[Double]("mad"))))
      .toMap

    assert(got == expected.toMap)
    assert(got.nonEmpty, "fixture flags no outliers — vacuous test")
    // both-ways completeness on the raw rows
    val byId = got.keySet
    evs.foreach { case (id, tpe, v) =>
      val flagged = byId.contains(id)
      val inExpected = expected.contains(id)
      assert(flagged == inExpected, s"row $id ($tpe, $v) flag mismatch")
    }
  }
}
