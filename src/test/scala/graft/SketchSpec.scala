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

  test("q181: every prefix range serves every quantile within the relative band") {
    import graft.functions.{BucketCount, QuantileSketch}
    SparkEntry.queries("q181_quantile_sketch_store")(spark, d).collect() // build store
    val store = sources.Sources.scratchLeaf(d, "quant_day_store")
    val days = spark.read.parquet(store).select("day").orderBy("day")
      .collect().map(_.getDate(0).toLocalDate)
    assert(days.nonEmpty)
    val valuesByDay = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"), col("value"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getDouble(1))).toMap
    days.foreach { hi =>
      val hist = spark.read.parquet(store)
        .where(col("day") <= lit(hi.toString))
        .select(explode(col("sk")).as("bc"))
        .groupBy(col("bc.bucket").as("bucket")).agg(sum(col("bc.cnt")).as("cnt"))
        .collect().map(r => BucketCount(r.getAs[Int]("bucket"), r.getAs[Long]("cnt"))).toSeq
      val exactVals = days.filter(_.compareTo(hi) <= 0)
        .flatMap(valuesByDay.getOrElse(_, Array.empty[Double])).sorted
      assert(hist.map(_.cnt).sum === exactVals.length.toLong,
        s"prefix ≤ $hi: histogram count diverged from row count")
      Seq(0.5, 0.9, 0.99).foreach { q =>
        val est = QuantileSketch.quantile(hist, q)
        val exact = exactVals(
          (math.max(1L, math.ceil(q * exactVals.length).toLong) - 1).toInt)
        assert(math.abs(est - exact) <= exact * QuantileSketch.RelErrBound,
          s"prefix ≤ $hi q=$q: est $est vs exact $exact — outside ±${QuantileSketch.RelErrBound}")
      }
    }
  }

  test("q181: two-level merge equals flat merge bit-for-bit; merge order is irrelevant") {
    import graft.functions.{BucketCount, QuantileSketch, QuantileSketchAggregator}
    SparkEntry.queries("q181_quantile_sketch_store")(spark, d).collect()
    val store = sources.Sources.scratchLeaf(d, "quant_day_store")
    def toHist(rows: Array[org.apache.spark.sql.Row]): Map[Int, Long] =
      rows.flatMap(_.getSeq[org.apache.spark.sql.Row](0)
        .map(bc => bc.getInt(0) -> bc.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val daySketches = spark.read.parquet(store).orderBy("day").select("sk").collect()
    // flat: merge all days at once
    val flat = toHist(daySketches)
    // two-level: merge each half, then merge the halves
    val (h1, h2) = daySketches.splitAt(daySketches.length / 2)
    val twoLevel = (toHist(h1).toSeq ++ toHist(h2).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(flat === twoLevel, "two-level bucket counts diverged from flat merge")
    // reversed merge order: cell-wise addition must be commutative
    val reversed = toHist(daySketches.reverse)
    assert(flat === reversed, "merge order changed the histogram")
    val asSeq = flat.toSeq.map { case (b, c) => BucketCount(b, c) }
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val a = QuantileSketch.quantile(asSeq, q)
      val b = QuantileSketch.quantile(
        twoLevel.toSeq.map { case (k, c) => BucketCount(k, c) }, q)
      assert(java.lang.Double.doubleToLongBits(a) === java.lang.Double.doubleToLongBits(b),
        s"q=$q: two-level estimate diverged bit-wise from flat")
    }
    // the aggregator's own merge path agrees with the stored sketches:
    // build one sketch over the whole span directly and compare
    import spark.implicits._
    val sk = org.apache.spark.sql.functions.udaf(new QuantileSketchAggregator(),
      org.apache.spark.sql.Encoders.scalaDouble)
    val wholeRows = Tables.events(spark, d)
      .agg(sk(col("value")).as("sk")).select("sk").collect()
    assert(toHist(wholeRows) === flat,
      "one-shot aggregation diverged from the merged day store")
  }
}
