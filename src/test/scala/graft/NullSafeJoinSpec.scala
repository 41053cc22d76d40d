package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q196 contract — `<=>` keeps the NULL key bucket a standard equi-join
  * silently drops, and it plans as a real hash/sort-merge join key (not
  * a nested-loop residual).
  */
class NullSafeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q196: the null bucket is present; plain = drops exactly that row") {
    val df = SparkEntry.queries("q196_null_safe_join")(spark, TestSpark.Sf0001)
    val rows = df.collect()
    val nullRows = rows.filter(_.isNullAt(df.columns.indexOf("k")))
    assert(nullRows.length == 1, "expected exactly one NULL-key bucket row")
    // counterfactual: the same join with standard equality loses only it
    def side(tpe: String, outn: String) =
      graft.Tables.events(spark, TestSpark.Sf0001)
        .where(col("event_type") === tpe)
        .select(nullif(col("user_id") % 50, lit(0)).as("k"))
        .groupBy("k").agg(count(lit(1)).as(outn))
    val c = side("click", "n_clicks"); val p = side("purchase", "n_buys")
    val strict = c.join(p, c("k") === p("k"), "inner").collect()
    assert(strict.length == rows.length - 1,
      "standard equality should drop exactly the null×null match")
  }

  test("q196 plans EqualNullSafe as a join key, not a nested loop") {
    val plan = SparkEntry.queries("q196_null_safe_join")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"null-safe join fell off the hash-join path:\n$plan")
  }
}
