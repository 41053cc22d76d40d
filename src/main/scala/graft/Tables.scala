package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory and reads only the
  * tables it needs — Catalyst prunes columns and pushes filters into the
  * parquet scan, so "load the table" costs only what the plan touches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across driver
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects outright — read as a raw nanos long via the legacy
    * conf, then convert; the data is µs-aligned per TESTDATA.md) and
    * plain TIMESTAMP(MICROS) `isAdjustedToUTC=false`, which Spark 4
    * infers as TIMESTAMP_NTZ. `nanosTsToMicros` normalizes EITHER
    * encoding to a session-local TimestampType — the session timezone is
    * pinned to UTC in every entry point, so the NTZ→LTZ cast preserves
    * instants exactly and both generations produce identical values.
    * `eventsNanosConf` + `nanosTsToMicros` are shared with the streaming
    * twins (q37 etc.) so batch and stream can never diverge on the
    * conversion.
    */
  def eventsNanosConf(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def nanosTsToMicros(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    eventsNanosConf(s)
    nanosTsToMicros(apply(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
