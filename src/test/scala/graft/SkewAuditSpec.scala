package graft

import org.scalatest.funsuite.AnyFunSuite

/** q158 skew-audit differential: recompute every statistic from the raw
  * per-key multiplicities in plain Scala (sorted-multiplicity quantiles,
  * not the histogram walk — an independent route to the same numbers)
  * and require exact agreement; then pin the ordering/shape invariants
  * (p50 ≤ p99 ≤ max, salt_hint ≥ 1, the hottest key appears in
  * top_keys).
  */
class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q158 matches a sorted-multiplicity replay") {
    val cnts = Tables.events(spark, d).select("user_id").collect()
      .map(_.getAs[Long]("user_id"))
      .groupBy(identity).map { case (u, a) => (u, a.length.toLong) }

    val mults = cnts.values.toSeq.sorted
    val nKeys = mults.length.toLong
    val totalRows = mults.sum
    val maxCnt = mults.last
    def sel(pos: Long): Long = mults((pos - 1).toInt)
    val p50 = sel((nKeys + 1) / 2)
    val p99 = sel(((99 * nKeys) + 99) / 100)
    val mean = totalRows.toDouble / nKeys.toDouble
    val topKeys = cnts.toSeq.sortBy { case (u, c) => (-c, u) }.take(8)
      .map { case (u, c) => s"$u:$c" }.sorted.mkString(",")

    val r = SparkEntry.queries("q158_skew_audit")(spark, d).collect().head
    assert(r.getAs[Long]("n_keys") == nKeys)
    assert(r.getAs[Long]("total_rows") == totalRows)
    assert(r.getAs[Long]("max_cnt") == maxCnt)
    assert(r.getAs[Long]("p50_cnt") == p50)
    assert(r.getAs[Long]("p99_cnt") == p99)
    assert(r.getAs[Double]("mean_cnt") == mean)
    assert(r.getAs[Double]("skew_ratio") == maxCnt.toDouble / mean)
    assert(r.getAs[Long]("salt_hint") == (maxCnt + p50 - 1) / p50)
    assert(r.getAs[String]("top_keys") == topKeys)

    assert(p50 <= p99 && p99 <= maxCnt)
    assert(r.getAs[Long]("salt_hint") >= 1L)
    val hottest = cnts.minBy { case (u, c) => (-c, u) }
    assert(topKeys.split(",").contains(s"${hottest._1}:${hottest._2}"))
  }
}
