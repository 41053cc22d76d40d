package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.BfsHops]] contract on planted graphs the real
  * pair fixture never exercises:
  *   - distances are MINIMUM hop counts when two seeds race down a
  *     path (each node labeled by the nearer seed);
  *   - the radius cap excludes everything strictly beyond `maxHops`,
  *     including nodes reachable only through the cut boundary;
  *   - a cycle back into visited territory neither relabels nor loops
  *     (first touch is final);
  *   - isolated seeds surface at hop 0; disconnected non-seeds don't
  *     surface at all.
  */
class BfsHopsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    operators.BfsHops
      .run(edges.toDF("a", "b"), seeds.toDF("doc_id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two seeds on a path: every node takes the nearer seed's distance") {
    // path 1-2-3-4-5-6-7, seeds at both ends
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val got = run(edges, Seq(1L, 7L), maxHops = 6)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L), s"min-distance drifted: $got")
  }

  test("radius cap excludes nodes strictly beyond maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = run(edges, Seq(1L), maxHops = 2)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      s"cap at 2 hops violated: $got")
  }

  test("a cycle does not relabel visited nodes or extend the walk") {
    // triangle 1-2-3 with seed 1: 2 and 3 are both 1 hop; the 2-3 edge
    // must not promote either to 2
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq(1L), maxHops = 4)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L), s"cycle mishandled: $got")
  }

  test("isolated seeds emit at 0; disconnected non-seeds never emit") {
    val got = run(Seq((5L, 6L)), Seq(1L, 5L), maxHops = 3)
    assert(got == Map(1L -> 0L, 5L -> 0L, 6L -> 1L),
      s"isolation semantics drifted: $got")
  }
}
