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

  test("builder-time extension injection compiles against the public API") {
    // the extension object is a SparkSessionExtensions => Unit; applying
    // it to a fresh extensions container must inject without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
