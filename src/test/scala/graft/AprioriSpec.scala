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

  /** Hostile fixture: one VIRAL basket of 100 one-off items (each
    * appears nowhere else) plus a planted frequent triple in two other
    * baskets. The L1/L2 semi-joins sit BEFORE the per-basket pair
    * joins, so the viral basket must contribute ZERO rows to the pair
    * join's input — without the pre-prune it would pay 100·99/2 pair
    * rows before any filter. Pinned on the staged builders themselves
    * (items1/items2 row counts), not just the final answer.
    */
  test("q316 viral basket: pair-join input stays L1/L2-bounded; answer exact") {
    import spark.implicits._
    val viral = (1L to 100L).map(pk => (900L, 1000L + pk))
    val planted = Seq((901L, 1L), (901L, 2L), (901L, 3L),
      (902L, 1L), (902L, 2L), (902L, 3L))
    val dir = java.nio.file.Files.createTempDirectory("graft_q316_spec").toString
    (viral ++ planted).toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")

    val items = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
    import graft.queries.Relational2.Apriori
    // L1 prune kills all 100 viral one-offs before the pair count
    assert(Apriori.items1(items).count() == 6L,
      "L1 semi-join must drop every one-off viral item pre-pair-join")
    // L2-membership prune bounds the basket-pair join the same way
    assert(Apriori.items2(items, Apriori.l2(items)).count() == 6L,
      "L2-member semi-join must bound the basket-pair join input")

    val out = SparkEntry.queries("q316_apriori_triples")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out == Map((1L, 2L, 3L) -> 2L))

    // regression gate: the prunes are semi-joins in the BUILD pipeline's
    // physical plan (the registered query reads the materialized L2/items2
    // artifacts, so the semi-joins live in the artifact build, not the
    // serving read — assert on the composed pipeline directly)
    val plan = graft.queries.Relational2.Apriori.triples(items)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "expected LeftSemi pre-prunes in the build plan")
  }
}
