package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q172/q173 sketch contracts, wider than the in-query audits:
  *   (a) CMS: the no-undercount + eps-bound guarantees must hold for the
  *       ENTIRE vocabulary, not just the 16 words the query reports;
  *   (b) HLL: the per-day sketch store must serve EVERY prefix range of
  *       days within the ±5% contract (the query samples 3 ranges), and
  *       the estimates must come from sketch UNION, not rescans — pinned
  *       by unioning day sketches pairwise and getting the same answer.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q172: CMS guarantees hold across the whole vocabulary") {
    val (cms, n) = queries.Sketches.cmsSketch(spark, d)
    val bound = math.ceil(0.001 * n).toLong
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("cnt"))
    assert(vocab.nonEmpty)
    vocab.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS undercounted '$w': $est < $c — structurally impossible")
      assert(est <= c + bound, s"CMS blew the eps bound on '$w': $est > $c + $bound")
    }
  }

  test("q173: every prefix range serves within ±5%, and union is associative") {
    SparkEntry.queries("q173_hll_sketch_store")(spark, d).collect() // build store
    val store = sources.Sources.scratchLeaf(d, "hll_day_store")
    val days = spark.read.parquet(store).select("day").orderBy("day")
      .collect().map(_.getDate(0).toLocalDate)
    assert(days.nonEmpty)
    days.zipWithIndex.foreach { case (hi, _) =>
      val est = spark.read.parquet(store)
        .where(col("day") <= lit(hi.toString))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
      val exact = Tables.events(spark, d)
        .where(to_date(col("ts")) <= lit(hi.toString))
        .agg(countDistinct(col("user_id"))).head().getLong(0)
      assert(math.abs(est - exact) <= exact * 0.05,
        s"prefix ≤ $hi: est $est vs exact $exact — outside ±5%")
    }
    // associativity: union(all days at once) == union(union(first half), rest)
    val whole = spark.read.parquet(store)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
    val mid = days(days.length / 2)
    val halves = spark.read.parquet(store)
      .withColumn("half", (col("day") <= lit(mid.toString)).cast("int"))
      .groupBy("half").agg(expr("hll_union_agg(sk, false)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
    assert(whole === halves, "two-level sketch union diverged from flat union")
  }
}
