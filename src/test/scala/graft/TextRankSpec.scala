package graft

import org.scalatest.funsuite.AnyFunSuite

/** q118 TextRank mathematical contract. The co-occurrence graph is
  * symmetric (every node has out-edges), so damped PageRank must
  * (a) conserve probability mass — scores sum to 1 with no dangling
  * leak, (b) respect the teleport floor (1-d)/N on every node, and
  * (c) contract: with damping 0.85 each iteration shrinks the L1 step
  * size, so the late steps must move far less than the early ones —
  * the evidence that 10 fixed iterations is a settling choice, not an
  * arbitrary truncation.
  */
class TextRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def scores(iters: Int): Map[String, Double] =
    queries.TextAnalysis.textRankScores(spark, d, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("q118: scores conserve probability mass (sum = 1, no dangling leak)") {
    val s = scores(queries.TextAnalysis.TextRankIters)
    assert(s.nonEmpty)
    assert(math.abs(s.values.sum - 1.0) < 1e-9, s"mass = ${s.values.sum}")
  }

  test("q118: every node holds at least the teleport floor (1-d)/N") {
    val s = scores(queries.TextAnalysis.TextRankIters)
    val floor = (1.0 - queries.TextAnalysis.TextRankDamping) / s.size
    s.foreach { case (w, r) =>
      assert(r >= floor - 1e-12, s"$w scored $r below the teleport floor $floor")
    }
  }

  test("q118: the iteration contracts (late L1 steps far below early ones)") {
    val Seq(r1, r2, r9, r10) = Seq(1, 2, 9, 10).map(scores)
    def l1(a: Map[String, Double], b: Map[String, Double]): Double =
      a.keys.map(k => math.abs(a(k) - b(k))).sum
    val early = l1(r2, r1)
    val late = l1(r10, r9)
    assert(late < early, s"no contraction: step9→10 moved $late vs step1→2 $early")
    assert(late < 0.5 * early, s"weak contraction: $late vs $early")
  }
}
