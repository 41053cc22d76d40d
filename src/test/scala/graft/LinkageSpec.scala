package graft

import org.scalatest.funsuite.AnyFunSuite

/** q313 Fellegi–Sunter differential: replay the frequency-based u
  * estimates, the micro-quantized ln weights, the blocked pair scores,
  * and the top-50 total order in plain Scala; pin the model's defining
  * monotonicity — agreement on a field always outweighs disagreement
  * (w_agree > w_disagree per field), so scores rank by evidence.
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q313 matches a plain-Scala Fellegi-Sunter replay; weights are evidence-monotone") {
    val cust = Tables.customer(spark, d)
      .selectExpr("CAST(c_custkey AS LONG) AS k", "CAST(c_nationkey AS LONG) AS nat",
        "c_mktsegment AS seg", "CAST(floor(c_acctbal * 100 + 0.5) AS LONG) AS bal")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        (r.getLong(3) + 100000L) / 100000L, r.getLong(0) % 10, r.getLong(0) % 7))

    def u[K](field: Seq[K]): Double = {
      val nv = field.groupBy(identity).map(_._2.length.toLong)
      nv.map(v => v * v).sum.toDouble / (field.length.toLong * field.length.toLong).toDouble
    }
    def w(m: Double, mc: Double, uu: Double): (Long, Long) =
      (math.floor(math.log(m / uu) * 1e6 + 0.5).toLong,
        math.floor(math.log(mc / (1.0 - uu)) * 1e6 + 0.5).toLong)

    val (waSeg, wdSeg) = w(0.95, 0.05, u(cust.map(_._3).toSeq))
    val (waBal, wdBal) = w(0.9, 0.1, u(cust.map(_._4).toSeq))
    val (waDig, wdDig) = w(0.85, 0.15, u(cust.map(_._5).toSeq))
    assert(waSeg > wdSeg && waBal > wdBal && waDig > wdDig,
      "agreement must always carry more evidence than disagreement")

    val expected = (for {
      x <- cust; y <- cust
      if x._2 == y._2 && x._6 == y._6 && x._1 < y._1
    } yield {
      val (agS, agB, agD) = (x._3 == y._3, x._4 == y._4, x._5 == y._5)
      val s = (if (agS) waSeg else wdSeg) + (if (agB) waBal else wdBal) +
        (if (agD) waDig else wdDig)
      (x._1, y._1, agS, agB, agD, s.toDouble / 1e6)
    }).sortBy { case (ka, kb, _, _, _, s) => (-s, ka, kb) }.take(50).toSeq

    val out = SparkEntry.queries("q313_record_linkage")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getDouble(5))).toSeq
    assert(out == expected)
  }
}
