package graft

import org.scalatest.funsuite.AnyFunSuite

/** q307 mutual k-NN: independent within-cell replay in plain Scala
  * (same cosine fold order as the native expression, same HALF_UP
  * 6-digit rounding, same (cos desc, dst asc) rank, k = 3, keep only
  * reciprocated pairs) — the distributed rank/reciprocity pipeline
  * must agree pair-for-pair. Also pins the two properties mutuality
  * exists for: the output is a strict subset of the directional top-3
  * edge set, and every emitted pair really is ranked ≤ 3 in BOTH
  * directions.
  */
class MutualKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q307 equals a sequential reciprocal-NN replay") {
    import org.apache.spark.sql.functions._
    val corpus = graft.queries.Similarity
      .ivfWithCells(spark, d, graft.queries.Similarity.ivfCents(spark, d))
      .select(col("vec_id"), col("v"), element_at(col("cells"), 1)("j").as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getAs[Number](2).longValue))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var sx = 0.0; var sy = 0.0; var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) { dot += x(i) * y(i); sx += x(i) * x(i); sy += y(i) * y(i); i += 1 }
      dot / (math.sqrt(sx) * math.sqrt(sy))
    }
    val top = corpus.groupBy(_._3).iterator.flatMap { case (_, members) =>
      members.iterator.flatMap { case (src, v, _) =>
        members.iterator
          .filter(_._1 != src)
          .map { case (dst, u, _) => (dst, cos(v, u)) }
          .filter(t => java.lang.Double.isFinite(t._2))
          .map { case (dst, raw) =>
            (dst, BigDecimal.valueOf(raw)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).doubleValue)
          }
          .toSeq.sortBy { case (dst, c) => (-c, dst) }
          .take(3).zipWithIndex
          .map { case ((dst, c), i) => (src, dst) -> ((c, i + 1L)) }
      }
    }.toMap
    val expected = top.collect {
      case ((a, b), (c, rab)) if a < b && top.contains((b, a)) =>
        (a, b) -> ((c, rab, top((b, a))._2))
    }
    val got = SparkEntry.queries("q307_mutual_knn")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected,
      s"mutual-kNN replay diverged (${got.size}/${expected.size})")
    assert(got.nonEmpty && got.size * 2 < top.size,
      "mutuality must genuinely prune the directional edge set")
  }
}
