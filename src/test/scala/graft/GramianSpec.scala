package graft

import org.scalatest.funsuite.AnyFunSuite

/** q262 contract — the driver-sized eigen step the oracle doesn't cover:
  *   (a) the gramian is exactly symmetric (g(i,j) = g(j,i) bit-for-bit —
  *       decimal summation makes both orders identical) with positive
  *       diagonal;
  *   (b) power iteration on the collected d×d matrix converges: the
  *       Rayleigh residual ‖Gv − λv‖ / (λ‖v‖) drops below 1e-6, λ > 0,
  *       and λ is bounded by the trace (both within machine reason);
  *   (c) fixture sanity: d = 64, all d² entries present.
  */
class GramianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val entries: Map[(Long, Long), Double] =
    queries.Similarity.embeddingGramian.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("q262: symmetric, positive diagonal, complete") {
    val dim = math.sqrt(entries.size.toDouble).toLong
    assert(dim * dim === entries.size.toLong, "gramian is not square")
    assert(dim === 64L, s"unexpected dimension $dim")
    for (i <- 0L until dim; j <- 0L until dim) {
      assert(entries.contains((i, j)), s"missing entry ($i,$j)")
      assert(entries((i, j)) === entries((j, i)), s"asymmetry at ($i,$j)")
    }
    for (i <- 0L until dim)
      assert(entries((i, i)) > 0.0, s"non-positive diagonal at $i")
  }

  test("q262: power iteration converges on the collected matrix") {
    val dim = 64
    val g = Array.tabulate(dim, dim)((i, j) => entries((i.toLong, j.toLong)))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to 200) {
      val gv = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + g(i)(j) * v(j)))
      val norm = math.sqrt(gv.foldLeft(0.0)((a, x) => a + x * x))
      lambda = norm
      v = gv.map(_ / norm)
    }
    val gv = Array.tabulate(dim)(i =>
      (0 until dim).foldLeft(0.0)((acc, j) => acc + g(i)(j) * v(j)))
    val residual = math.sqrt(
      gv.zip(v).map { case (a, b) => val e = a - lambda * b; e * e }.sum)
    assert(lambda > 0.0)
    assert(residual / lambda < 1e-6,
      s"power iteration did not converge: residual/lambda = ${residual / lambda}")
    val trace = (0 until dim).map(i => g(i)(i)).sum
    assert(lambda <= trace * (1 + 1e-9),
      s"dominant eigenvalue $lambda exceeds trace $trace")
  }
}
