package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q184 contract — the shredded variant store must actually change the
  * SCAN, not just round-trip values:
  *   (a) with `pushVariantIntoScan`, the read-back path access scans a
  *       TYPED struct subcolumn (ReadSchema shows struct, not variant) —
  *       zero parse at scan time;
  *   (b) the counterfactual: same store, pushdown off — the scan reads
  *       the binary variant column and re-assembles (ReadSchema shows
  *       variant);
  *   (c) content: q184 through the store equals q178 in memory
  *       row-for-row (shredding must be a layout change, never a
  *       semantic one).
  */
class VariantShredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def shredSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    s.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    s.conf.set("spark.sql.variant.allowReadingShredded", "true")
    s.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
    s
  }

  private def readSchemaOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema"))
      // the scan line also holds the store PATH (which contains the word
      // "variant") — gate on the schema text alone
      .map(_.split("ReadSchema:").last.trim).getOrElse("")

  test("q184: path access over the shredded store scans a typed subcolumn") {
    // build the store through the registered query (also proves it runs)
    assert(SparkEntry.queries("q184_variant_shred_store")(spark, d).count() > 0)
    val store = sources.Sources.scratchLeaf(d, "variant_store")
    val s = shredSession()
    val rs = readSchemaOf(
      s.read.parquet(store).select(expr("variant_get(v, '$.k', 'bigint')").as("k")))
    assert(rs.contains("v:struct<"), s"scan did not shred-push the path access: $rs")
    assert(!rs.contains("variant"), s"scan still reads the binary variant: $rs")
  }

  test("q184: with pushdown off the same store reads the binary variant column") {
    val store = sources.Sources.scratchLeaf(d, "variant_store")
    val s = shredSession()
    s.conf.set("spark.sql.variant.pushVariantIntoScan", "false")
    val df = s.read.parquet(store)
      .select(expr("variant_get(v, '$.k', 'bigint')").as("k"))
    val rs = readSchemaOf(df)
    assert(rs.contains("variant"), s"expected a binary variant read: $rs")
    // and it still answers identically — the binary fallback is complete
    val sShred = shredSession()
    val typed = sShred.read.parquet(store)
      .select(expr("variant_get(v, '$.k', 'bigint')").as("k"))
    assert(df.agg(sum("k")).head().getLong(0) === typed.agg(sum("k")).head().getLong(0))
  }

  test("q184 equals q178 row-for-row") {
    val shredded = SparkEntry.queries("q184_variant_shred_store")(spark, d)
    val inMemory = SparkEntry.queries("q178_variant_extract")(spark, d)
    assert(shredded.count() === inMemory.count())
    assert(shredded.exceptAll(inMemory).isEmpty && inMemory.exceptAll(shredded).isEmpty)
  }
}
