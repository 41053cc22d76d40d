package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sink-side coverage: partitioned parquet writes (the lake layout a
  * 100 TB corpus lands in — partition pruning on read is free), and the
  * optimizer rule injected by GraftExtensions.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("partitionBy(lang) write produces prunable layout; read prunes partitions") {
    val out = "target/tmp/docs_by_lang"
    Tables.documents(spark, d)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("lang=")) >= 5, dirs.toSeq)
    val one = spark.read.parquet(out).where(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(1500))
    assert(one.count() ===
      Tables.documents(spark, d).where(col("lang") === "en").count())
  }

  test("q90: compaction collapses the 32-file input to the byte-target file count") {
    SparkEntry.queries("q90_compaction")(spark, d).collect()
    def nFiles(path: String): Int =
      Option(new java.io.File(path).listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(-1)
    val nIn = nFiles(graft.sources.Sources.scratchLeaf(d, "compact_in"))
    val nOut = nFiles(graft.sources.Sources.scratchLeaf(d, "compact_out"))
    assert(nIn === 32, s"expected the forced small-file layout, saw $nIn files")
    // sf0.001 documents total well under one 4 MB target file
    assert(nOut === 1, s"compaction produced $nOut files from $nIn")
  }

  test("SelfCosineRule folds cosine_similarity(x, x) to 1.0") {
    graft.plans.GraftExtensions.register(spark)
    val withRule = graft.plans.SelfCosineRule(
      spark.range(1).select(
        graft.functions.CosineSimilarity(
          expr("array(CAST(id AS DOUBLE))"), expr("array(CAST(id AS DOUBLE))")).as("c"))
        .queryExecution.analyzed)
    assert(withRule.toString.contains("1.0"), withRule.toString)
  }
}
