package graft

import org.scalatest.funsuite.AnyFunSuite

/** q209 contract — each hint really selects its physical join; q208's
  * codecs really engage (compressed files smaller than uncompressed).
  */
class JoinHintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q209: BROADCAST/MERGE/SHUFFLE_HASH hints pick their operators") {
    Tables.orders(spark, TestSpark.Sf0001).createOrReplaceTempView("orders_h")
    Tables.customer(spark, TestSpark.Sf0001).createOrReplaceTempView("customer_h")
    def planOf(hint: String): String = {
      val df = spark.sql(s"""SELECT /*+ $hint(c) */ count(*)
                             FROM orders_h o JOIN customer_h c ON o.o_custkey = c.c_custkey""")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planOf("BROADCAST").contains("BroadcastHashJoin"))
    assert(planOf("MERGE").contains("SortMergeJoin"))
    assert(planOf("SHUFFLE_HASH").contains("ShuffledHashJoin"))
  }

  test("q208: compressed codecs produce smaller files than uncompressed") {
    // run the registered query so the five stores exist, then size them
    val rows = SparkEntry.queries("q208_parquet_codecs")(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Boolean]("exact_roundtrip")))
    def bytes(codec: String): Long = {
      val dir = new java.io.File(
        graft.sources.Sources.scratchLeaf(TestSpark.Sf0001, s"codec_$codec"))
      Option(dir.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    val none = bytes("uncompressed")
    assert(none > 0, "no parquet files found for the uncompressed store")
    for (c <- Seq("zstd", "snappy", "gzip", "lz4"))
      assert(bytes(c) < none, s"$c produced no compression over uncompressed")
  }
}
