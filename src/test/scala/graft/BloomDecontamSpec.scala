package graft

import org.scalatest.funsuite.AnyFunSuite

/** q136 bloom-accelerated decontamination contract: on a corpus with a
  * PLANTED leak (a benchmark passage copied into a training doc), the
  * bloom-prefiltered pipeline must flag exactly what q82's plain exact
  * join flags — same pairs, same shared-gram counts (the no-false-
  * negative property of the prefilter, end to end). Built on a temp
  * parquet dir (the DedupIncrementalSpec fixture discipline) because
  * the pristine corpus has no genuine bench leakage to flag.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val src = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    val leakFrom = src.find(_.getAs[Long]("doc_id") % 101 == 0).get
    val rows = src.map { r =>
      val id = r.getAs[Long]("doc_id")
      // plant: one training doc (id % 101 != 0) embeds a bench passage
      val text =
        if (id == 7L) r.getAs[String]("text") + " " + leakFrom.getAs[String]("text")
        else r.getAs[String]("text")
      (id, text, r.getAs[String]("lang"), r.getAs[String]("source"), r.getAs[Long]("n_chars"))
    }
    val d = java.nio.file.Files.createTempDirectory("graft_bloom_spec").toString
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q136: planted leak flagged identically to the exact q82 join") {
    def pairs(q: String): Map[(Long, Long), Long] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc")) ->
          r.getAs[Long]("n_shared")).toMap

    val exact = pairs("q82_decontaminate")
    val bloomed = pairs("q136_decontaminate_bloom")

    assert(exact.nonEmpty, "planted leak not flagged by the exact join — fixture broken")
    assert(exact.keys.exists(_._1 == 7L), "the planted training doc is not among the flags")
    assert(bloomed == exact,
      s"bloom pipeline drifted: only-exact=${(exact.keySet -- bloomed.keySet).take(3)} " +
        s"only-bloom=${(bloomed.keySet -- exact.keySet).take(3)}")
  }

  /** The round-9 economics contract: the prefilter must be the NATIVE
    * codegen'd `might_contain` over `xxhash64` riding the train-side
    * scan stage — a closure UDF here fences the petabyte side of the
    * join out of whole-stage codegen, which is exactly the plan defect
    * the first cut shipped.
    */
  test("q136: the probe is the native might_contain expression, not a closure UDF") {
    val plan = SparkEntry.queries("q136_decontaminate_bloom")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "native bloom probe missing from the plan")
    assert(plan.contains("xxhash64"), "probe key is not the codegen'd xxhash64")
    assert(!plan.contains("UDF("), "closure UDF re-entered the probe path")
  }
}
