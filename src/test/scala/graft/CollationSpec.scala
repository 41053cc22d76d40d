package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q192 contract — collated grouping really merges case spellings the
  * binary collation would split, and the merge happens in the ENGINE's
  * comparator (not via a lower() projection of the data).
  */
class CollationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q192: every group merged 3 binary-distinct spellings") {
    val rows = SparkEntry.queries("q192_collated_group")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    // lang values are all-lowercase multi-char tags, so upper / Initcap /
    // raw are pairwise binary-distinct — each collated group holds all 3
    assert(rows.forall(_.getAs[Long]("n_spellings") == 3L),
      "a collated group failed to merge the three case spellings")
    // keys are projected back to binary lowercase — no uppercase survives
    assert(rows.forall(r => { val k = r.getAs[String]("lang"); k == k.toLowerCase }))
  }

  test("binary grouping splits what UTF8_LCASE merges") {
    import spark.implicits._
    val df = Seq("en", "En", "EN", "de", "DE").toDF("lang_raw")
    val collated = df.groupBy(expr("collate(lang_raw, 'UTF8_LCASE')")).count().count()
    val binary = df.groupBy(col("lang_raw")).count().count()
    assert(collated === 2L)
    assert(binary === 5L)
  }

  test("collated equality holds in filters too") {
    import spark.implicits._
    val n = Seq("Mixed", "MIXED", "mixed", "other").toDF("s")
      .where(expr("s = ('mixed' COLLATE UTF8_LCASE)")).count()
    assert(n === 3L)
  }
}
