package graft

import org.scalatest.funsuite.AnyFunSuite

/** q160 equi-depth binning contract: a sequential replay (sort all
  * (quality, doc_id) pairs, select the ⌈k·n/20⌉ edges, count smaller
  * edges per doc) must agree exactly, and the resulting bins must be
  * EQUI-DEPTH — with distinct sort keys every bin holds ⌊n/20⌋ or
  * ⌈n/20⌉ documents — and ORDER-CONSISTENT (no document in a lower bin
  * outranks one in a higher bin).
  */
class EcdfBinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val B = 20

  test("q160 matches a sequential edge-selection replay and is equi-depth") {
    val scored = queries.TextAnalysis.qualityScore.fn(spark, d)
      .select("doc_id", "quality").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality")))

    val sorted = scored.map { case (id, q) => (q, id) }.sortBy(identity)
    val n = sorted.length.toLong
    val edges = (1 until B).map(k => sorted(((k * n + B - 1) / B - 1).toInt))
    def bin(q: Double, id: Long): Long =
      edges.count(e => e._1 < q || (e._1 == q && e._2 < id)).toLong

    val expected = scored.map { case (id, q) => id -> ((q, bin(q, id))) }.toMap
    val got = SparkEntry.queries("q160_ecdf_bins")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("quality"), r.getAs[Long]("bin"))))
      .toMap
    assert(got == expected)

    val sizes = got.values.groupBy(_._2).map { case (b, g) => (b, g.size) }
    assert(sizes.keySet == (0L until B).toSet, s"missing bins: $sizes")
    val lo = (n / B).toInt
    sizes.values.foreach(sz => assert(sz == lo || sz == lo + 1, sizes))

    // order consistency: max sort key of bin b < min sort key of bin b+1
    val byBin = got.toSeq.map { case (id, (q, b)) => (b, (q, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    (0L until (B - 1).toLong).foreach { b =>
      assert(Ordering[(Double, Long)].lt(byBin(b).max, byBin(b + 1).min),
        s"bins $b/${b + 1} overlap")
    }
  }
}
