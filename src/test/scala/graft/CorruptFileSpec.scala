package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q288 contract — the counterfactual its oracle can't show: WITHOUT
  * `ignoreCorruptFiles` the same corrupted store kills the read (the
  * default posture the option exists to change), and the resilient
  * read's blast radius is exactly the destroyed partition.
  */
class CorruptFileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q288: default read fails on the corrupted store; resilient read drops only it") {
    // the registered query (re)builds + corrupts the store, then reads it
    val survived = sources.Sources.corruptFileSkip.fn(spark, d).collect()
    val types = survived.map(_.getAs[String]("event_type")).toSet
    assert(types == Set("click", "purchase", "signup", "view"),
      s"blast radius wrong: $types")

    val store = sources.Sources.scratchLeaf(d, "corrupt_store")
    val strict = spark.read
      .option("ignoreCorruptFiles", "false")
      .schema("event_id BIGINT, v DECIMAL(18,2), event_type STRING")
      .parquet(store)
    val e = intercept[org.apache.spark.SparkException] {
      strict.agg(count(lit(1))).collect()
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("parquet") || msg.toLowerCase.contains("corrupt"),
      s"unexpected failure mode: ${msg.take(300)}")
  }
}
