package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Triangle-census contracts on closed-form graphs the synthetic near-dup
  * graph never forms (it is chain/pair dominated): a K4 clique, a chain,
  * a hub star, and a mixed graph, checked against hand-counted truth and
  * a brute-force O(n³) recount. Also pins the hub-immunity property the
  * degree orientation exists for: a pure star has zero triangles and the
  * hub must still appear (with 0) in the output.
  */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.counts(edges.toDF("a", "b"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("triangles")).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap(e => Seq(e, e.swap)).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val tris = for {
      i <- nodes; j <- nodes if i < j && und((i, j))
      k <- nodes if j < k && und((j, k)) && und((i, k))
    } yield Seq(i, j, k)
    nodes.map(n => n -> tris.count(_.contains(n)).toLong).toMap
  }

  test("K4 clique: every node sits in 3 of the 4 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = run(k4)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(out == brute(k4))
    assert(out.values.sum == 3 * 4, "mass identity: 3 corners per triangle")
  }

  test("chain: zero triangles, every node still reported") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = run(chain)
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("hub star: no triangles and the hub appears with zero") {
    val star = (1L to 20L).map(i => (100L, i))
    val out = run(star)
    assert(out(100L) == 0L && out.size == 21 && out.values.forall(_ == 0L))
  }

  test("mixed graph matches the brute-force recount") {
    // two triangles sharing edge (2,3), a pendant chain, an isolated edge
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (8L, 9L))
    val out = run(g)
    assert(out == brute(g))
    assert(out(2L) == 2L && out(3L) == 2L && out(1L) == 1L && out(4L) == 1L)
    assert(out(5L) == 0L && out(8L) == 0L)
  }
}
