package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.ColumnLineage]] contract on plan shapes beyond
  * q306's fixture: alias-of-alias chains resolve to the ORIGINAL
  * leaf, a multi-input expression unions both sources, join
  * passthrough keeps each side's identity, renames survive a
  * union, and nothing about the walk executes the query.
  */
class ColumnLineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    plans.ColumnLineage.lineage(df).toSet

  test("alias chains resolve through; multi-input expressions union sources") {
    import org.apache.spark.sql.functions._
    val df = Tables.customer(spark, d)
      .select(col("c_name").as("step1"), col("c_custkey"))
      .select(col("step1").as("step2"), col("c_custkey"))
      .select(concat(col("step2"), col("c_custkey")).as("combined"))
    assert(edges(df) == Set(
      ("combined", "customer", "c_name"),
      ("combined", "customer", "c_custkey")))
  }

  test("join passthrough keeps per-side identity; literals map to '-'") {
    import org.apache.spark.sql.functions._
    val df = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderdate"), col("c_name"), lit("x").as("tag"))
    assert(edges(df) == Set(
      ("o_orderdate", "orders", "o_orderdate"),
      ("c_name", "customer", "c_name"),
      ("tag", "-", "-")))
  }

  test("q306's registered edge list matches the hand-derived ground truth") {
    val got = SparkEntry.queries("q306_column_lineage")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("audit_flag", "-", "-"),
      ("avg_order", "orders", "o_totalprice"),
      ("rev_rank", "orders", "o_totalprice"),
      ("revenue", "orders", "o_totalprice"),
      ("segment", "customer", "c_mktsegment")), s"lineage drifted: $got")
  }
}
