package graft

import org.scalatest.funsuite.AnyFunSuite

/** q133 winsorization differential contract: recompute the rank-defined
  * [p05, p95] bounds and the clipping in plain Scala and require exact
  * agreement; pin the defining properties — clipped values live inside
  * the bounds, in-range values pass through untouched, and something is
  * actually clipped on this data (a vacuous clamp proves nothing).
  */
class WinsorizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q133: bounds and clipping match a plain-Scala recomputation") {
    val ev = Tables.events(spark, d)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))

    val bounds = ev.groupBy(_._2).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      val n = sorted.length
      def at(q: Int) = sorted(math.max((n * q + 99) / 100, 1) - 1)._3
      (at(5), at(95))
    }.toMap

    val out = SparkEntry.queries("q133_winsorize")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[String]("event_type"), r.getAs[Double]("p05"),
          r.getAs[Double]("p95"), r.getAs[Double]("value"),
          r.getAs[Double]("clipped")))).toMap

    assert(out.size == ev.length)
    ev.foreach { case (id, tpe, v) =>
      val (p05, p95) = bounds(tpe)
      val (otpe, o05, o95, ov, oc) = out(id)
      assert(otpe == tpe && o05 == p05 && o95 == p95 && ov == v, s"row $id drifted")
      assert(oc == math.min(math.max(v, p05), p95), s"row $id clipped wrong")
      assert(oc >= p05 && oc <= p95)
      if (v >= p05 && v <= p95) assert(oc == v, s"in-range row $id was altered")
    }
    assert(ev.exists { case (id, tpe, v) => out(id)._5 != v },
      "nothing clipped — fixture has no tail mass")
  }
}
