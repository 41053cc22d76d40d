package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q156 drift-monitor differential: recompute the per-label window
  * centroids and the cosine/L2 metrics in plain Scala — same vec_id-
  * ordered member fold, same dim-ordered accumulation, same rounding —
  * and require exact agreement. Plus the structural contract: every
  * label with members in both windows appears once, counts partition the
  * finite vectors, and cos_drift stays in [-1, 1].
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q156 matches a plain-Scala centroid replay exactly") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Double]]("v")))
      .filter(_._3.forall(x => !x.isNaN && !x.isInfinite))

    def centroid(members: Seq[(Long, Seq[Double])]): Array[Double] = {
      val sorted = members.sortBy(_._1)
      Array.tabulate(64) { i =>
        var acc = 0.0
        sorted.foreach(m => acc += m._2(i))
        acc / sorted.length
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += a(i) * b(i); i += 1 }
      acc
    }

    val expected = vecs.groupBy(_._2).flatMap { case (label, rows) =>
      val (refM, newM) = rows.map(r => (r._1, r._3)).partition(_._1 % 2 == 0)
      if (refM.isEmpty || newM.isEmpty) None
      else {
        val ca = centroid(refM)
        val cb = centroid(newM)
        val cos = round6(dot(ca, cb) / (math.sqrt(dot(ca, ca)) * math.sqrt(dot(cb, cb))))
        var sq = 0.0
        (0 until 64).foreach { i => val z = ca(i) - cb(i); sq += z * z }
        Some(label.toLong -> ((refM.length.toLong, newM.length.toLong,
          cos, round6(math.sqrt(sq)))))
      }
    }

    val got = SparkEntry.queries("q156_embedding_drift")(spark, d).collect()
      .map(r => r.getAs[Long]("label") -> ((r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_new"), r.getAs[Double]("cos_drift"),
        r.getAs[Double]("l2_shift"))))
      .toMap

    assert(got == expected)
    assert(got.nonEmpty)
    got.values.foreach { case (_, _, cos, shift) =>
      assert(cos >= -1.0 && cos <= 1.0)
      assert(shift >= 0.0)
    }
  }
}
