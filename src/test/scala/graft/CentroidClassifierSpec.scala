package graft

import org.scalatest.funsuite.AnyFunSuite

/** q331 nearest-centroid classifier: plain-Scala replay (vec_id-ordered
  * per-dimension fold for centroids, 6-digit-rounded cosine argmax with
  * label tiebreak) plus the audit invariants — the matrix sums to the
  * vector count, and the classifier beats chance on the fixture (the
  * diagonal dominates 1/|labels| of the mass, else the "space health"
  * reading is vacuous).
  */
class CentroidClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q331 equals a plain-Scala replay; matrix conserves mass; beats chance") {
    val raw = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "CAST(label AS LONG) AS label",
        "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .filter(_._3.forall(x => !x.isNaN && !x.isInfinite))
    val dim = raw.head._3.length
    val cents = raw.groupBy(_._2).map { case (l, rows) =>
      val sorted = rows.sortBy(_._1)
      l -> Array.tabulate(dim) { i =>
        // strict left fold in vec_id order — the engine's aggregate()
        sorted.foldLeft(0.0)((acc, r) => acc + r._3(i)) / sorted.length
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = raw.map { case (_, l, v) =>
      val pred = cents.toSeq.map { case (cl, c) => (cl, r6(cos(v, c))) }
        .minBy { case (cl, s) => (-s, cl) }._1
      (l, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = SparkEntry.queries("q331_centroid_classifier")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == expected, "confusion matrix diverges from the replay")
    assert(out.values.sum == raw.length.toLong, "matrix does not conserve mass")
    val correct = out.collect { case ((l, p), n) if l == p => n }.sum
    val labels = raw.map(_._2).distinct.length
    assert(correct.toDouble / raw.length > 1.0 / labels,
      s"accuracy ${correct.toDouble / raw.length} at/below chance — vacuous audit")
  }
}
