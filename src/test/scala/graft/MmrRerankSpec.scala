package graft

import org.scalatest.funsuite.AnyFunSuite

/** q330 MMR re-rank: a plain-Scala greedy replay (same 6-digit-rounded
  * micro-quantized cosines, same 7/3 integer trade-off, same tiebreak)
  * must reproduce the unrolled dataframe recursion exactly, and the
  * diversity term must be LIVE — for some probe the MMR shortlist must
  * differ from the pure-relevance top-5, otherwise λ might as well be 1.
  */
class MmrRerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def micro(x: Double): Long =
    math.floor(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      * 1e6 + 0.5).toLong

  test("q330 equals a plain-Scala greedy MMR replay; diversity term is live") {
    val vecs = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val expected = (0L until 4L).flatMap { p =>
      val cand = vecs.keys.filter(_ != p).toSeq
        .map(c => (c, micro(cos(vecs(p), vecs(c)))))
        .sortBy { case (c, rel) => (-rel, c) }.take(12)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      (1 to 5).foreach { k =>
        val pickable = cand.filterNot(c => sel.exists(_._1 == c._1)).map { case (c, rel) =>
          val msim = if (sel.isEmpty) 0L
            else sel.map(s => micro(cos(vecs(c), vecs(s._1)))).max
          (c, rel, 7 * rel - 3 * msim)
        }
        val best = pickable.minBy { case (c, _, mmr) => (-mmr, c) }
        sel += best
      }
      sel.zipWithIndex.map { case ((c, rel, mmr), i) => (p, i + 1L) -> ((c, rel, mmr)) }
    }.toMap
    val out = SparkEntry.queries("q330_mmr_rerank")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == expected, s"greedy replay diverges")

    // diversity liveness: some probe's MMR shortlist is NOT the
    // relevance top-5 (in selection order = rel desc order)
    val relTop5 = (0L until 4L).map { p =>
      p -> vecs.keys.filter(_ != p).toSeq
        .map(c => (c, micro(cos(vecs(p), vecs(c)))))
        .sortBy { case (c, rel) => (-rel, c) }.take(5).map(_._1)
    }.toMap
    val mmrOrder = (0L until 4L).map { p =>
      p -> (1L to 5L).map(k => out((p, k))._1)
    }.toMap
    assert((0L until 4L).exists(p => mmrOrder(p) != relTop5(p)),
      "MMR equals pure relevance for every probe — the diversity term is vacuous")
  }
}
