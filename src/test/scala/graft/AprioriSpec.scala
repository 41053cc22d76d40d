package graft

import org.scalatest.funsuite.AnyFunSuite

/** q316 Apriori differential: brute-force EVERY in-basket triple in
  * plain Scala (no candidate generation, no pruning) and require the
  * query's generate-and-prune pipeline to find exactly the frequent
  * ones — the downward-closure theorem as a test: pruning must be
  * lossless. Also pins anti-monotonicity on the output (each triple's
  * support ≤ each of its pair supports) and that pruning was
  * LOAD-BEARING (some triple with an infrequent sub-pair exists in the
  * baskets and is absent from the output).
  */
class AprioriSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q316 equals the brute-force frequent-triple set; pruning is lossless and live") {
    val items = Tables.lineitem(spark, d)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).map { case (_, v) => v.map(_._2).distinct.sorted }

    val allTriples = baskets.toSeq.flatMap(_.combinations(3).map(c => (c(0), c(1), c(2))))
    val support = allTriples.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val expected = support.filter(_._2 >= 2L)

    val out = SparkEntry.queries("q316_apriori_triples")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out == expected)

    // anti-monotonicity: a triple never out-supports its pairs
    val pairSup = baskets.toSeq.flatMap(_.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    out.foreach { case ((a, b, c), s) =>
      assert(s <= pairSup((a, b)) && s <= pairSup((a, c)) && s <= pairSup((b, c)),
        s"($a,$b,$c): support $s exceeds a sub-pair's")
    }

    // pruning liveness: the baskets contain a triple with an infrequent
    // sub-pair — the prune branch actually rejected candidates
    val pruned = allTriples.distinct.filter { case (a, b, c) =>
      pairSup((a, b)) < 2 || pairSup((a, c)) < 2 || pairSup((b, c)) < 2
    }
    assert(pruned.nonEmpty, "no prunable triples at sf0.001 — the prune claim is vacuous")
    pruned.foreach(t => assert(!out.contains(t)))
  }
}
