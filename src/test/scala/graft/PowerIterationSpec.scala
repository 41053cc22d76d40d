package graft

import org.scalatest.funsuite.AnyFunSuite

/** q293 power-iteration contract beyond the oracle (which pins only
  * cross-engine bit-equality of the 200 fixed iterations): the answer
  * must be a NUMERICALLY GOOD eigenpair, not just a deterministic
  * one — unit norm, eigenvalue within the trace bound, and aligned
  * with an independently-converged dominant eigenvector (500
  * iterations from a different start vector).
  */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val out = SparkEntry.queries("q293_power_iteration")(spark, d)
    .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    .sortBy(_._1)

  test("q293: unit-norm vector, one eigenvalue, trace bound") {
    assert(out.length == 64, "one row per dimension")
    val lambdas = out.map(_._3).distinct
    assert(lambdas.length == 1, "eigenvalue column must be constant")
    val norm = math.sqrt(out.map { case (_, c, _) => c * c }.sum)
    assert(math.abs(norm - 1.0) < 1e-12, s"vector norm $norm is not 1")
    val g = queries.Similarity.gramianDF(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val trace = (0L until 64L).map(i => g((i, i))).sum
    assert(lambdas.head > 0.0 && lambdas.head <= trace * (1 + 1e-9),
      s"eigenvalue ${lambdas.head} outside (0, trace=$trace]")
  }

  test("q293: lands on the dominant eigenpair (independent replay, different start)") {
    // independence: 500 iterations from the e₀ basis vector — a
    // different start and a longer run than the query's 200-from-
    // uniform, so agreement proves convergence to THE dominant
    // eigenpair rather than replaying the query's own arithmetic
    val g = queries.Similarity.gramianDF(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dim = 64
    val gm = Array.tabulate(dim, dim)((i, j) => g((i.toLong, j.toLong)))
    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    var lambda = 0.0
    for (_ <- 1 to 500) {
      val gv = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + gm(i)(j) * v(j)))
      lambda = math.sqrt(gv.foldLeft(0.0)((a, x) => a + x * x))
      v = gv.map(_ / lambda)
    }
    val dot = out.map(_._2).zip(v).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.9999,
      s"query vector misaligned with converged eigenvector: |cos| = ${math.abs(dot)}")
    assert(math.abs(out.head._3 - lambda) / lambda < 1e-6,
      s"query eigenvalue ${out.head._3} vs converged $lambda")
  }
}
