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

  test("partition planning honors slices and drops empty ranges") {
    assert(read(rows = 1000, slices = 8).rdd.getNumPartitions == 8)
    // narrowed range of 3 rows over 8 slices: only non-empty chunks plan
    val narrow = read(rows = 1000, slices = 8).where(col("id") >= 10 && col("id") < 13)
    assert(narrow.rdd.getNumPartitions <= 3)
    assert(narrow.count() == 3)
  }
}
