package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q269 contract — the statistic itself, checked against an independent
  * driver-side computation (plain Scala sort + running counts), plus
  * the degenerate bounds: D ∈ (0, 1] here, and D of a sample against
  * itself is exactly 0.
  */
class KsTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q269: engine D equals the independent sequential replay") {
    val row = queries.Profiling.ksTest.fn(spark, d).head()
    val (n1, n2, dStat) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val rows = Tables.events(spark, d)
      .where(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = rows.filter(_._1 == "purchase").map(_._2).sorted
    val b = rows.filter(_._1 == "click").map(_._2).sorted
    assert(a.length.toLong === n1 && b.length.toLong === n2)
    val values = (a ++ b).distinct.sorted
    var best = 0.0
    values.foreach { v =>
      val fa = a.count(_ <= v).toDouble / a.length.toDouble
      val fb = b.count(_ <= v).toDouble / b.length.toDouble
      best = math.max(best, math.abs(fa - fb))
    }
    assert(math.abs(dStat - best) < 1e-12,
      s"engine D=$dStat vs replay D=$best")
    assert(dStat > 0.0 && dStat <= 1.0)
  }

  test("q269: a distribution against itself has D = 0; disjoint ranges D = 1") {
    // replicate the scan arithmetic on tiny planted vectors
    def ks(a: Seq[Double], b: Seq[Double]): Double = {
      val vs = (a ++ b).distinct.sorted
      vs.map(v => math.abs(
        a.count(_ <= v).toDouble / a.length - b.count(_ <= v).toDouble / b.length)).max
    }
    val x = Seq(1.0, 2.0, 3.0, 4.0)
    assert(ks(x, x) === 0.0)
    assert(ks(Seq(1.0, 2.0), Seq(10.0, 11.0)) === 1.0)
  }
}
