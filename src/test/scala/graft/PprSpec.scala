package graft

import org.scalatest.funsuite.AnyFunSuite

/** q340 personalized PageRank: plain-Scala replay of the 3-step integer
  * walk on the same L2 co-purchase graph, plus the properties that make
  * it PERSONALIZED — seeds hold the top of the ranking (restart mass),
  * at least one NON-seed neighbor is ranked (the recommendation output
  * is live), and total mass never exceeds the injected budget
  * (truncating division only loses mass, never invents it).
  */
class PprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q340 equals a plain-Scala replay; seeds dominate; non-seed recs exist") {
    val items = Tables.lineitem(spark, d)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // NOTE: .collect{...=> p} on a Map with a tuple-valued function
    // rebuilds a MAP (deduping by pair head) — filter + keys instead
    val pairs = items.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val ps = v.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (s, v) => s -> v.map(_._2) }
    val deg = edges.map { case (s, v) => s -> v.size.toLong }
    val seeds = edges.keys.toSeq.sorted.take(4)
    var r: Map[Long, Long] = seeds.map(_ -> 250000L).toMap
    (1 to 3).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      r.foreach { case (node, score) =>
        edges.getOrElse(node, Seq.empty).foreach { dst =>
          contrib(dst) += (85L * score) / (100L * deg(node))
        }
      }
      r = (contrib.keySet ++ seeds).map { n =>
        n -> ((if (seeds.contains(n)) 37500L else 0L) + contrib(n))
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (n, sc) => (-sc, n) }.take(20)
    val out = SparkEntry.queries("q340_personalized_pagerank")(spark, d).collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq
    assert(out == expected, s"PPR replay diverges:\n got $out\n exp $expected")
    // restart mass keeps seeds at the top; the walk surfaces non-seeds
    assert(seeds.forall(sd => out.take(8).exists(_._1 == sd)),
      "a seed fell out of the top-8 — teleport mass broken")
    assert(out.exists { case (n, _) => !seeds.contains(n) },
      "no non-seed in the top-20 — the recommender output is vacuous")
    // truncation only loses mass: total <= 1e6 at every step's fixpoint
    assert(r.values.sum <= 1000000L, s"mass invented: ${r.values.sum}")
  }
}
