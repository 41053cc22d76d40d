package graft

import org.scalatest.funsuite.AnyFunSuite

/** q204 contract — SQL UDFs INLINE: the cataloged function disappears
  * into the plan (no black-box UDF node survives), so the optimizer
  * treats the call sites as hand-written SQL.
  */
class SqlUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q204 plan contains no ScalaUDF — the SQL function inlined") {
    val df = SparkEntry.queries("q204_sql_udf")(spark, TestSpark.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"SQL UDF did not inline:\n${plan.take(1500)}")
    assert(plan.contains("HashAggregate"), "expected an ordinary aggregate plan")
  }

  test("q204 equals the hand-inlined expression") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q204_sql_udf")(spark, TestSpark.Sf0001)
    val q = col("quality")
    val want = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), expr(
        """CASE WHEN size(split(text, ' ')) < 20 THEN 0.0
                ELSE 1.0 - CAST(size(filter(split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
                           / size(split(text, ' ')) END""").as("quality"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(q >= 0.7, 1L).otherwise(0L)).as("n_good"),
        min(q).as("min_q"), max(q).as("max_q"))
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }
}
