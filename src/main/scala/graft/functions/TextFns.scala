package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis suites.
  *
  * Everything here is built on deterministic, engine-portable operations
  * (md5 over UTF-8 bytes, integer arithmetic) so each derived operator can
  * be cross-checked bit-for-bit against the driver's DuckDB oracle — the
  * same discipline the reference enforces by defining grouping purely via
  * `operator<` (`/root/reference/MapReduceFramework.cpp:197`): semantics
  * must not depend on engine-internal hashing.
  *
  * Scale note (100 TB design point): all functions return narrow
  * per-document relations (doc_id, gram) produced by `explode` — a narrow
  * transformation with no shuffle; downstream groupBys shuffle on the gram
  * or doc key with map-side partial aggregation.
  */
object TextFns {

  /** Whitespace tokens of `text` as an array column (single-spaced input). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-grams, one row per (doc_id, g).
    * Docs shorter than n words yield no grams.
    */
  def wordGrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .where(size(col("ws")) >= n)
      .select(
        col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))"))
          .as("g"))
      .distinct()

  /** Portable hash: lowercase-hex md5 of the UTF-8 bytes of a string
    * column — identical in Spark (`md5(binary)`) and DuckDB (`md5(varchar)`).
    */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** Seeded portable hash family: h_i(x) = md5(i || '|' || x). */
  def seededMd5(seed: Column, c: Column): Column =
    md5Hex(concat(seed.cast("string"), lit("|"), c))
}
