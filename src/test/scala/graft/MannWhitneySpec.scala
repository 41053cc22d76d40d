package graft

import org.scalatest.funsuite.AnyFunSuite

/** q271 contract — the rank arithmetic against an independent replay:
  *   (a) U₁/U₂/z on the real two-sample fixture equal a plain Scala
  *       computation (sort, average ranks over tie groups, textbook
  *       formulas) to 1e-9/1e-6;
  *   (b) invariants: U₁ + U₂ = n₁·n₂ exactly; both non-negative.
  */
class MannWhitneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q271: engine U and z equal the independent replay; invariants hold") {
    val row = queries.Profiling.mannWhitney.fn(spark, d).head()
    val (n1, n2) = (row.getLong(0), row.getLong(1))
    val (u1, u2, z) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(u1 + u2 === n1.toDouble * n2.toDouble, "U1 + U2 must equal n1*n2")
    assert(u1 >= 0.0 && u2 >= 0.0)

    val rows = Tables.events(spark, d)
      .where(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = rows.filter(_._1 == "purchase").map(_._2)
    val b = rows.filter(_._1 == "click").map(_._2)
    assert(a.length.toLong === n1 && b.length.toLong === n2)
    // average ranks over the pooled sorted sample
    val pooled = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    val rankOf = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < pooled.length) {
      var j = i
      while (j < pooled.length && pooled(j)._1 == pooled(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1 .. j
      rankOf(pooled(i)._1) = avg
      i = j
    }
    val r1 = a.map(rankOf).sum
    val expU1 = r1 - n1.toDouble * (n1 + 1).toDouble / 2.0
    assert(math.abs(u1 - expU1) < 1e-6, s"U1 $u1 vs replay $expU1")
    // z replay with tie correction
    val nn = (n1 + n2).toDouble
    val tsum = pooled.groupBy(_._1).values
      .map(g => { val t = g.length.toDouble; t * t * t - t }).sum
    val mu = n1.toDouble * n2.toDouble / 2.0
    val sigma = math.sqrt(n1.toDouble * n2.toDouble / 12.0 *
      ((nn + 1.0) - tsum / (nn * (nn - 1.0))))
    val expZ = (expU1 - mu) / sigma
    assert(math.abs(z - expZ) < 1e-5, s"z $z vs replay $expZ")
  }
}
