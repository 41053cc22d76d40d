package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q357 — IVF cell-quality audit: full plain-Scala replay of the table
  * from the collected centroid row (assignment argmax, strict-fold
  * scatter, dt₁−dt₂ margin, micro quantization), plus the properties
  * that make it an instrument: the occupancy column accounts for every
  * finite vector exactly once, and the boundary population — the
  * structural floor under q355's nprobe = 1 recall — is live and
  * strictly partial.
  */
class IvfCellAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val out: Map[Long, (Long, Long, Long)] =
    SparkEntry.queries("q357_ivf_cell_audit")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** (cell id, centroid) pairs from the engine's own literal relation. */
  private lazy val cents: Seq[(Int, Array[Double])] = {
    val row = graft.queries.Similarity.ivfCents(spark, d).collect().head
    row.getSeq[org.apache.spark.sql.Row](0)
      .map(sc => (sc.getInt(0), sc.getSeq[Double](1).toArray)).toSeq
  }

  private lazy val finiteVecs: Seq[Array[Double]] =
    Tables.embeddings(spark, d)
      .select(col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .filter(v => v.forall(x => !x.isNaN && !x.isInfinity)).toSeq

  private def fold(f: Int => Double, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += f(i); i += 1 }
    s
  }

  test("the whole table replays in plain Scala from the collected centroids") {
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      .withDefaultValue((0L, 0L, 0L))
    for (v <- finiteVecs) {
      val dots = cents.map { case (j, c) => (j, fold(i => v(i) * c(i), v.length)) }
      val ranked = dots.sortBy { case (j, dt) => (-dt, j) }
      val (cell, dt1) = ranked.head
      val dt2 = ranked(1)._2
      val c = cents.find(_._1 == cell).get._2
      val d2 = fold(i => (v(i) - c(i)) * (v(i) - c(i)), v.length)
      val d2m = math.floor(d2 * 1000000.0 + 0.5).toLong
      val mgm = math.floor((dt1 - dt2) * 1000000.0 + 0.5).toLong
      val (n, sc, nb) = acc(cell.toLong)
      acc(cell.toLong) = (n + 1, sc + d2m, nb + (if (mgm < 10000L) 1L else 0L))
    }
    for (cell <- 0L until 8L)
      assert(out(cell) == acc(cell), s"cell $cell drifts: ${out(cell)} vs ${acc(cell)}")
  }

  test("occupancy accounts for every finite vector exactly once") {
    assert(out.values.map(_._1).sum == finiteVecs.length)
  }

  test("the boundary population is live and strictly partial") {
    val total = out.values.map(_._1).sum
    val boundary = out.values.map(_._3).sum
    assert(boundary > 0L, "no boundary members — the margin instrument is dead here")
    assert(boundary < total, "every member is boundary — the quantizer is vacuous here")
  }

  test("scatter is positive wherever a cell has members") {
    for ((cell, (n, scat, _)) <- out if n > 0)
      assert(scat > 0L, s"cell $cell has $n members but zero scatter")
  }
}
