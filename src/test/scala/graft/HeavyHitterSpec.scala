package graft

import org.scalatest.funsuite.AnyFunSuite

/** q135 heavy-hitter contract: (a) the two-pass output equals the exact
  * full-aggregation top-16 (recomputed in plain Scala), and (b) the
  * Misra–Gries guarantee holds UNDER EVICTION PRESSURE — with k = 4 on
  * a skewed synthetic stream, every word with frequency > N/(k+1) must
  * survive the summary (the pigeonhole half of the query's losslessness
  * argument, which the real corpus never exercises because its
  * vocabulary is smaller than k).
  */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q135: output equals the exact top-16") {
    val counts = Tables.documents(spark, d)
      .select("text").collect()
      .flatMap(_.getAs[String]("text").split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(16)

    val out = SparkEntry.queries("q135_heavy_hitters")(spark, d)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("cnt"))).toSeq

    assert(out == expected, s"drift: $out vs $expected")
  }

  test("q135: Misra–Gries never evicts a true heavy hitter (k = 4, forced pressure)") {
    val k = 4
    // skewed stream: two heavy words far above N/(k+1), a long uniform tail
    val stream = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      (0 until 300).map(i => s"tail${i % 100}")
    val n = stream.length
    val heavy = stream.groupBy(identity).view.mapValues(_.length)
      .filter(_._2 > n / (k + 1)).keySet

    assert(heavy.nonEmpty, "fixture has no heavy hitters above N/(k+1)")
    val survivors = queries.TextAnalysis.mgSummary(stream.iterator, k).map(_._1).toSet
    assert(survivors.size <= k)
    heavy.foreach { w =>
      assert(survivors.contains(w), s"heavy hitter $w evicted by the summary")
    }
  }
}
