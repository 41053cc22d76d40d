package graft

import org.scalatest.funsuite.AnyFunSuite

/** q190 contract — the XML round-trip is lossless, including the edge the
  * format makes hazardous: XML has no native null/empty distinction and
  * parsers trim element text by default, so the connector must carry the
  * explicit options that preserve surrounding whitespace, empty strings,
  * and nulls distinctly.
  */
class XmlRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q190 equals the parquet source row-for-row at sf0.001") {
    val got = SparkEntry.queries("q190_xml_roundtrip")(spark, TestSpark.Sf0001)
    val want = spark.read.parquet(TestSpark.Sf0001 + "/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars", "text")
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("whitespace, empties, markup, and nulls survive the XML round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, " leading"), (2L, "trailing "), (3L, "  "), (4L, ""),
      (5L, null.asInstanceOf[String]), (6L, "<tag>&amp; \"quoted\""),
      (7L, "line\nbreak")).toDF("id", "s")
    val out = java.nio.file.Files.createTempDirectory("graft_xml_spec").toString
    df.write.mode("overwrite").option("rowTag", "doc").xml(out)
    val back = spark.read.schema(df.schema).option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false").xml(out)
    assert(back.count() === 7)
    assert(df.except(back).count() === 0 && back.except(df).count() === 0,
      "XML round-trip changed a value — check trimming / escaping / null options")
    // the DEFAULT reader really does trim — the option is load-bearing
    val trimmed = spark.read.schema(df.schema).option("rowTag", "doc").xml(out)
    assert(trimmed.where("id = 1").head().getString(1) === "leading",
      "default trim behavior changed; revisit whether the option is still needed")
  }
}
