package graft

import org.scalatest.funsuite.AnyFunSuite

/** q318 PQ-distortion differential: recompute every vector's
  * reconstruction error in plain Scala from the SAME learned codebooks
  * (collected through the shared training artifact) — argmin by the
  * ½‖c‖²−⟨sv,c⟩ fold with the code-id tiebreak, dist = ⟨sv,sv⟩+2·nd in
  * the identical op order, subspace fold in m order, 1e-9 integer
  * quantization — and require the per-cell aggregates to match
  * exactly; pin the audit's meaning: distortion is nonnegative and a
  * 1-code-per-subspace quantizer reconstructs imperfectly (mean > 0).
  */
class PqDistortionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q318 matches a plain-Scala reconstruction-error replay") {
    import org.apache.spark.sql.functions._
    val subDim = 8
    val books = graft.queries.Similarity.pqBooks(spark, d).collect().map { r =>
      r.getAs[Int]("m") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("cs"))
          .map(c => (c.getInt(0), c.getSeq[Double](1).toArray)).sortBy(_._1)
    }.toMap

    val corpus = graft.queries.Similarity
      .ivfWithCells(spark, d, graft.queries.Similarity.ivfCents(spark, d))
      .select(col("vec_id"), col("v"), element_at(col("cells"), 1)("j").as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val perVec = corpus.map { case (_, v, cell) =>
      val total = (0 until books.size).map { m =>
        val sub = v.slice(m * subDim, m * subDim + subDim)
        val nd = books(m).map { case (j, c) => (0.5 * dot(c, c) - dot(sub, c), j) }.min._1
        dot(sub, sub) + 2.0 * nd
      }.foldLeft(0.0)(_ + _)
      cell -> math.floor(total * 1e9 + 0.5).toLong
    }
    val expected = perVec.groupBy(_._1).map { case (cell, qs) =>
      cell.toLong -> ((qs.length.toLong,
        qs.map(_._2).sum.toDouble / 1e9 / qs.length.toDouble,
        qs.map(_._2).max.toDouble / 1e9))
    }

    val out = SparkEntry.queries("q318_pq_distortion_audit")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out == expected)
    out.foreach { case (cell, (n, mean, max)) =>
      assert(n > 0 && mean >= 0.0 && max >= mean, s"cell $cell: degenerate audit row")
    }
    assert(out.values.exists(_._2 > 0.0), "zero distortion everywhere — PQ reconstructs perfectly?")
  }
}
