package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.KCore]] contract on planted graphs the real pair
  * fixture never exercises:
  *   - a long chain hanging off a triangle peels layer by layer
  *     (MULTIPLE rounds) and leaves exactly the triangle;
  *   - a pure path has an EMPTY 2-core (the all-edges-die-at-once stop
  *     state the oracle's post-recursion filter closes);
  *   - core degrees are degrees INSIDE the core, not in the input
  *     graph (the bridge node of two joined triangles has core degree
  *     4, its input degree).
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (core, rounds) = operators.KCore.run(edges.toDF("a", "b"), k)
    (core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("chain off a triangle peels over multiple rounds down to the triangle") {
    // triangle 1-2-3, chain 3-4-5-6-7-8
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val (core, rounds) = run(edges, 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"core drifted: $core")
    assert(rounds >= 3, s"a 5-edge chain must take multiple peel rounds, got $rounds")
  }

  test("a pure path has an empty 2-core") {
    val (core, _) = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2)
    assert(core.isEmpty, s"path should peel to nothing, got $core")
  }

  test("core degree is measured inside the core") {
    // two triangles sharing node 3, plus a pendant 3-9: node 3 has
    // input degree 5 but core degree 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L), (3L, 9L))
    val (core, _) = run(edges, 2)
    assert(core(3L) == 4L, s"bridge core degree: ${core.get(3L)}")
    assert(!core.contains(9L), "pendant survived the peel")
    assert(core(1L) == 2L && core(5L) == 2L)
  }

  test("q294 registered query: 2-core of the sf0.001 pair graph is the big clusters") {
    // sf0.001 clusters are cliques: 19 pairs, one 3-clique, one 4-clique
    // (FIXTURES) — the 2-core is exactly the two cliques' 7 nodes
    val out = SparkEntry.queries("q294_kcore")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 7, s"expected the 3-clique + 4-clique nodes, got ${out.size}")
    assert(out.values.toSeq.sorted == Seq(2L, 2L, 2L, 3L, 3L, 3L, 3L),
      s"core degrees drifted: ${out.values.toSeq.sorted}")
  }
}
