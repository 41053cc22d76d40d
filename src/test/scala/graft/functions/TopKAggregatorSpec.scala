package graft.functions

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("typed top-k aggregator agrees with q27's windowed top-k") {
    import spark.implicits._
    // rebuild q27's scored pairs, aggregate per probe with the UDAF
    val scored = SparkEntry.queries("q27_cosine_topk")(spark, d)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"))
    // feed ALL pairs (not just q27's pre-ranked 10) — recompute from scratch
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.where(col("vec_id") < 8)
    val pairs = broadcast(probes).as("q")
      .join(e.as("x"), col("x.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("probe_id"),
        col("x.vec_id").as("id"),
        round(CosineSimilarity(col("q.v"), col("x.v")), 6).as("score"))
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(10).toColumn
    val top = pairs
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => ScoredId(id, score) }
      .agg(agg)
      .collect()
      .flatMap { case (probe, items) => items.map(s => (probe, s.id, s.score)) }
      .toSet
    val expected = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(top === expected)
  }

  test("property: any partitioning + merge order reduces to the sequential top-k") {
    import spark.implicits._
    // the mergeable-accumulator law that makes map-side partial top-k
    // correct: however rows are split across tasks and however partials
    // are merged, the result equals the sequential fold
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(60)
      val xs = List.fill(n)(ScoredId(rnd.nextInt(20).toLong, rnd.nextInt(10).toDouble))
      val k = 1 + rnd.nextInt(5)
      val aggr = new TopKAggregator(k)
      val expected = xs.sorted(Ordering.by((s: ScoredId) => (-s.score, s.id))).take(k)
      val chunks = xs.grouped(1 + rnd.nextInt(xs.size)).toList
      val partials = rnd.shuffle(chunks.map(c => c.foldLeft(aggr.zero)(aggr.reduce)))
      val merged = partials.foldLeft(aggr.zero)(aggr.merge)
      assert(merged === expected, s"n=$n k=$k chunks=${chunks.map(_.size)}")
    }
  }

  test("partial-state bound: buffer never exceeds k") {
    import spark.implicits._
    val aggr = new TopKAggregator(3)
    val big = (1 to 100).map(i => ScoredId(i.toLong, i.toDouble))
    val reduced = big.foldLeft(aggr.zero)(aggr.reduce)
    assert(reduced.size === 3)
    assert(reduced.map(_.id).toSet === Set(100L, 99L, 98L))
    val merged = aggr.merge(reduced, big.take(50).foldLeft(aggr.zero)(aggr.reduce))
    assert(merged.size === 3 && merged.head.id === 100L)
  }
}
