package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q197 contract — the positional-union counterfactual: same-typed,
  * different-meaning columns silently swap under positional UNION (no
  * error, corrupt rows), while unionByName aligns by name and null-fills
  * what a shard never had.
  */
class UnionByNameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("positional union misaligns drifted schemas; unionByName does not") {
    import spark.implicits._
    val early = Seq((1L, "en", 100L)).toDF("doc_id", "lang", "n_chars")
    val late = Seq((2L, "web", 200L)).toDF("doc_id", "source", "n_chars")
    // positional: 'web' lands in the lang column — silently
    val positional = early.union(late)
    assert(positional.where(col("lang") === "web").count() === 1,
      "expected the silent misalignment this operator exists to prevent")
    // by name: source stays source, lang null-fills
    val byName = early.unionByName(late, allowMissingColumns = true)
    val lateRow = byName.where(col("doc_id") === 2L).head()
    assert(lateRow.getAs[String]("source") === "web")
    assert(lateRow.isNullAt(lateRow.fieldIndex("lang")),
      "missing column should null-fill, not borrow a neighbor")
  }

  test("q197: every early row has null quality, every late row null lang") {
    val rows = SparkEntry.queries("q197_union_by_name")(spark, TestSpark.Sf0001).collect()
    val (early, late) = rows.partition(_.getAs[Long]("doc_id") % 2 == 0)
    assert(early.nonEmpty && late.nonEmpty)
    assert(early.forall(r => r.isNullAt(r.fieldIndex("quality")) &&
      r.isNullAt(r.fieldIndex("source"))))
    assert(late.forall(r => r.isNullAt(r.fieldIndex("lang")) &&
      !r.isNullAt(r.fieldIndex("quality"))))
  }
}
