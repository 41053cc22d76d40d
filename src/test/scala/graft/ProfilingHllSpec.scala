package graft

import org.scalatest.funsuite.AnyFunSuite

/** q105 approximate profile: the error-bound contract standing in for
  * the hash oracle an approximate sketch cannot have (the q19/q49
  * pattern). Everything non-approximate must stay EXACT — only the
  * distinct estimate gets a band.
  */
class ProfilingHllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def byCol(q: String, distinctCol: String) =
    SparkEntry.queries(q)(spark, TestSpark.Sf0001).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_null"), r.getAs[Long](distinctCol),
          r.getAs[String]("min_str"), r.getAs[String]("max_str"),
          r.getAs[Long]("n_rows"))))
      .toMap

  test("q105: HLL distincts within 15% of q101's exact; all other stats exactly equal") {
    val exact = byCol("q101_profile", "n_distinct")
    val approx = byCol("q105_profile_hll", "n_distinct_approx")
    assert(approx.keySet == exact.keySet, "column sets differ")
    exact.foreach { case (c, (nNull, nDist, minS, maxS, nRows)) =>
      val (aNull, aDist, aMin, aMax, aRows) = approx(c)
      assert(aNull == nNull && aMin == minS && aMax == maxS && aRows == nRows,
        s"$c: non-approximate stats must match q101 exactly")
      val relErr =
        if (nDist == 0) math.abs(aDist.toDouble)
        else math.abs(aDist.toDouble - nDist.toDouble) / nDist.toDouble
      assert(relErr <= 0.15,
        f"$c: HLL estimate $aDist vs exact $nDist — rel err $relErr%.3f > 0.15")
    }
  }
}
