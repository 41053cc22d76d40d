package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_similarity is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D), array(2.0D, 1.0D)) AS c")
      .head.getDouble(0)
    assert(math.abs(r - 0.8) < 1e-12)
  }

  test("cosine_similarity rejects non-double arrays at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1, 2), array(2, 1)) AS c").collect()
    }
    val msg = e.getMessage
    assert(msg.contains("array<double>") || msg.contains("DATATYPE_MISMATCH"), msg)
  }

  test("cosine_similarity rejects wrong arity") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0D)) AS c").collect()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("seq_dot is callable from SQL and folds in ascending index order") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT seq_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(r === 32.0)
    // strict-fold parity with the HOF spelling it replaced (the q63
    // oracle contract): identical doubles on an order-sensitive sum
    val both = spark.sql(
      """SELECT seq_dot(v, c) AS native,
                aggregate(zip_with(v, c, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS hof
         FROM (SELECT array(1e16, 1.0D, -1e16, 2.5D) AS v,
                      array(1.0D, 1.0D, 1.0D, 1.0D) AS c)""").head
    assert(both.getDouble(0) === both.getDouble(1))
  }

  test("seq_dot generates fused whole-stage code") {
    import org.apache.spark.sql.functions.{col, expr}
    val df = spark.range(1).select(
      expr("array(CAST(id AS DOUBLE), CAST(id + 1 AS DOUBLE))").as("a"),
      expr("array(CAST(id + 2 AS DOUBLE), CAST(id + 3 AS DOUBLE))").as("b"))
      .select(graft.functions.SeqDot(col("a"), col("b")).as("d"))
    assert(df.head.getDouble(0) === 3.0)
    val gen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(gen.contains("toDoubleArray"), gen.take(1500))
  }

  test("builder-time extension injection compiles against the public API") {
    // the extension object is a SparkSessionExtensions => Unit; applying
    // it to a fresh extensions container must inject without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
