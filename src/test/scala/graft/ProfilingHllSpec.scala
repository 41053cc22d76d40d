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

  test("q105: exact companions equal q101; every hll_ok audit boolean holds") {
    val exact = byCol("q101_profile", "n_distinct")
    val rows = SparkEntry.queries("q105_profile_hll")(spark, TestSpark.Sf0001).collect()
    val approx = byCol("q105_profile_hll", "n_distinct_exact")
    assert(approx.keySet == exact.keySet, "column sets differ")
    exact.foreach { case (c, (nNull, nDist, minS, maxS, nRows)) =>
      val (aNull, aDist, aMin, aMax, aRows) = approx(c)
      assert(aNull == nNull && aMin == minS && aMax == maxS && aRows == nRows,
        s"$c: non-approximate stats must match q101 exactly")
      assert(aDist == nDist, s"$c: exact-distinct companion diverged from q101")
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"${r.getAs[String]("col_name")}: HLL estimate left its band — " +
          "the audit boolean the oracle gates on")
    }
  }
}
