package graft

import org.scalatest.funsuite.AnyFunSuite

/** q141 hard-negative mining differential: recompute cosine, the anchor-
  * positive, and the top-5 different-label negatives in plain Scala and
  * require exact agreement (same 6-digit rounding, same tiebreaks); pin
  * the defining properties — negatives never share the probe's label, the
  * positive always does, negative similarity is non-increasing in rank,
  * and margin ≡ pos_sim − neg_sim.
  */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q141 matches a plain-Scala mining pass and its contract holds") {
    val vecs = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Double](2).toArray))

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val expected = vecs.filter(_._1 < 8).flatMap { case (pid, plabel, pv) =>
      val scored = vecs.filter(_._1 != pid)
        .map { case (nid, nlabel, nv) => (nid, nlabel, cos(pv, nv)) }
        .sortBy { case (nid, _, sim) => (-sim, nid) }
      val pos = scored.filter(_._2 == plabel).head
      scored.filter(_._2 != plabel).take(5).zipWithIndex.map {
        case ((nid, _, sim), i) =>
          (pid, i + 1L) -> ((pos._1, pos._3, nid, sim, pos._3 - sim))
      }
    }.toMap

    val out = SparkEntry.queries("q141_hard_negatives")(spark, d)
      .collect().map { r =>
        (r.getAs[Long]("probe_id"), r.getAs[Long]("rnk")) ->
          ((r.getAs[Long]("pos_id"), r.getAs[Double]("pos_sim"),
            r.getAs[Long]("neg_id"), r.getAs[Double]("neg_sim"),
            r.getAs[Double]("margin")))
      }.toMap

    assert(out.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(out(k) == v, s"row $k drifted") }

    val labels = vecs.map(v => v._1 -> v._2).toMap
    out.foreach { case ((pid, rnk), (posId, posSim, negId, negSim, margin)) =>
      assert(labels(negId) != labels(pid), s"probe $pid: negative shares label")
      assert(labels(posId) == labels(pid), s"probe $pid: positive label differs")
      assert(margin == posSim - negSim)
      if (rnk > 1) assert(out((pid, rnk - 1))._4 >= negSim, "rank order broken")
    }
    // the fixture must actually contain a HARD negative (margin below some
    // positive similarity) or the mining demonstrates nothing
    assert(out.values.exists(_._5 < 0.1), "no hard negatives on this fixture")
  }
}
