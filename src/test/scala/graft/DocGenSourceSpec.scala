package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 connector contract (q154's source,
  * [[graft.sources.docgen.DefaultSource]]):
  *
  *  - pushed `id` filters are HONORED (DSv2 removes accepted filters from
  *    the post-scan list, so a source that narrows its range wrong
  *    silently corrupts results — proved differentially against a full
  *    read filtered Spark-side);
  *  - pushdown narrows the planned range and pruning removes unselected
  *    columns (both via the scan description in the executed plan);
  *  - partition planning honors `slices`, and an exhausted/narrowed range
  *    drops empty partitions instead of planning zero-row readers.
  */
class DocGenSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def read(rows: Long = 1000, slices: Int = 8) =
    spark.read.format("graft.sources.docgen")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("full read generates the closed-form table") {
    val rows = read().orderBy("id").collect()
    assert(rows.length == 1000)
    val r7 = rows(7)
    assert(r7.getAs[Long]("id") == 7L)
    assert(r7.getAs[String]("lang") == graft.sources.docgen.DocGen.Langs(2))
    assert(r7.getAs[Long]("tokens") == (7L * 2654435761L) % 997L)
    assert(r7.getAs[Double]("score") == (7L * 31L % 1000L).toDouble / 1000.0)
  }

  test("pushed id filters are honored: filtered read == full read filtered") {
    val pushed = read().where(col("id") >= 100 && col("id") < 300)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val manual = read().collect()
      .filter(r => r.getAs[Long]("id") >= 100 && r.getAs[Long]("id") < 300)
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(pushed.length == 200)
    assert(pushed.toSeq == manual.toSeq)
  }

  test("pushdown narrows the planned range; pruning drops unused columns") {
    val df = read().where(col("id") >= 100 && col("id") < 300)
      .select("id", "tokens")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenScan range=[100,300)"), plan)
    assert(plan.contains("cols=[id,tokens]"), plan)
    assert(!plan.contains("score"), plan)
  }

  test("equality pushdown plans a single-row range") {
    val df = read().where(col("id") === 42)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenScan range=[42,43)"), plan)
    assert(df.collect().map(_.getAs[Long]("id")).toSeq == Seq(42L))
  }

  test("non-id filters stay Spark-side and still apply") {
    val df = read().where(col("lang") === "en" && col("id") < 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenScan range=[0,50)"), plan)
    assert(plan.contains("Filter"), plan) // lang predicate post-scan
    val ids = df.collect().map(_.getAs[Long]("id"))
    assert(ids.nonEmpty && ids.forall(i => i % 5 == 0 && i < 50))
  }

  test("q242: complete aggregate pushdown answers from range metadata") {
    val agg = read().where(col("id") >= 100 && col("id") < 300)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), sum(col("id")).as("sum_id"))
    val plan = agg.queryExecution.executedPlan.toString
    // the scan IS the aggregate: closed-form one-row answer, and no
    // aggregate operator survives above it
    assert(plan.contains("DocGenAggScan range=[100,300) agg=[count_star,min_id,max_id,sum_id]"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
    val r = agg.collect().head
    // differential: the unpushed computation over generated rows
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Long]("min_id") == 100L)
    assert(r.getAs[Long]("max_id") == 299L)
    assert(r.getAs[Long]("sum_id") == (100L to 299L).sum)
  }

  test("q242: empty-range aggregate keeps SQL semantics (count 0, min/sum null)") {
    val r = read().where(col("id") < 0)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), sum(col("id")).as("sm"))
      .collect().head
    assert(r.getAs[Long]("n") == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("q243: LIMIT is fully pushed — range narrows, Limit operator gone") {
    val lim = read().where(col("id") >= 100).limit(7)
    val plan = lim.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenScan range=[100,107)"), plan)
    assert(!plan.contains("Limit") && !plan.contains("TakeOrdered"), plan)
    assert(lim.collect().map(_.getAs[Long]("id")).sorted.toSeq == (100L to 106L))
  }

  test("q243: ORDER BY id DESC LIMIT n generates only the last n ids") {
    val top = read().orderBy(col("id").desc).limit(5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenScan range=[995,1000)"), plan)
    // partially pushed: Spark still sorts the n survivors
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(top.collect().map(_.getAs[Long]("id")).toSeq == Seq(999L, 998L, 997L, 996L, 995L))
  }

  private def langSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  private def langRead(s: org.apache.spark.sql.SparkSession, rows: Long) =
    s.read.format("graft.sources.docgen")
      .option("rows", rows.toString).option("partitionBy", "lang").load()

  test("q244: lang-partitioned read generates exactly the plain read's rows") {
    val s2 = langSession
    val byLang = langRead(s2, 1000).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val plain = read(1000).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(byLang.toSeq == plain.toSeq)
  }

  test("q244: reported KeyGroupedPartitioning makes groupBy(lang) exchange-free") {
    val s2 = langSession
    val agg = langRead(s2, 1000).groupBy("lang").agg(count(lit(1)).as("n"))
    agg.collect() // AQE: final plan only exists after execution
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenLangScan"), plan)
    assert(!plan.contains("Exchange"), plan)
    // differential: without the reported layout the same aggregation shuffles
    val unreported = read(1000).groupBy("lang").agg(count(lit(1)).as("n"))
    unreported.collect()
    assert(unreported.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("q245: co-partitioned scans join with zero exchanges (storage-partitioned join)") {
    val s2 = langSession
    val a = langRead(s2, 2000).groupBy("lang").agg(sum(col("tokens")).as("tok_a"))
    val b = langRead(s2, 1000).groupBy("lang").agg(min(col("id")).as("min_b"))
    val j = a.join(b, Seq("lang"))
    val rows = j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(rows.length == 5)
    // min id per lang in [0, 1000): lang i holds ids ≡ i (mod 5) → min is i's
    // first id, i.e. the langIdx itself reordered by lang name
    val minByLang = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("min_b")).toMap
    val expected = (0 until 5).map(i => graft.sources.docgen.DocGen.Langs(i) -> i.toLong).toMap
    assert(minByLang == expected.map { case (k, v) => k -> v })
  }

  test("partition planning honors slices and drops empty ranges") {
    assert(read(rows = 1000, slices = 8).rdd.getNumPartitions == 8)
    // narrowed range of 3 rows over 8 slices: only non-empty chunks plan
    val narrow = read(rows = 1000, slices = 8).where(col("id") >= 10 && col("id") < 13)
    assert(narrow.rdd.getNumPartitions <= 3)
    assert(narrow.count() == 3)
  }
}
