package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Star-contraction connected components: correctness vs a local
  * union-find on random graphs, and the O(log n) round bound on the
  * worst case for plain label propagation — a long chain, whose diameter
  * would cost min-label propagation one round per hop.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      // self-loops register the node (it appears in the edge set and
      // must be labeled) without uniting anything
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val (labels, rounds) = ConnectedComponents.run(edges.toDF("a", "b"))
    (labels.as[(Long, Long)].collect().toMap, rounds)
  }

  test("chain of 256 nodes: one component, O(log n) rounds (not O(diameter))") {
    val n = 256
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val (got, rounds) = run(chain)
    assert(got.size == n)
    assert(got.values.toSet == Set(0L))
    // diameter is 255; star contraction must stay logarithmic
    val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("labels match a local union-find on random graphs") {
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L)))
    val prop = Prop.forAll(edgeGen) { edges =>
      val expected = localComponents(edges)
      expected.isEmpty || run(edges)._1 == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (1L, 2L), (5L, 4L), (4L, 5L))
    val (got, _) = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("a node whose only edge is a self-loop still gets a label (its own id)") {
    val edges = Seq((1L, 2L), (9L, 9L))
    val (got, _) = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("two disjoint components keep distinct minima") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    val (got, _) = run(edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }
}
