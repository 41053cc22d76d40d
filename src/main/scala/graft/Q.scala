package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One verifiable engine query: a Spark program plus (when SQL-expressible)
  * the equivalent ANSI SQL for the driver's DuckDB oracle. `oracle == None`
  * downgrades to the driver's rows-only check (used for approximate /
  * non-SQL-expressible operators).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact double-sum parity with DuckDB: sum in decimal (associative,
    * order-independent — Spark's partial aggregation order differs from
    * DuckDB's single-threaded fold, so summing raw doubles would drift in
    * the last bits), then one cast back to double. Scale 2 for the
    * 2-decimal generated columns, scale 4 for products of them.
    */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(24, 4))).cast(DoubleType)

  /** DuckDB-side spelling of dsum2/dsum4. */
  def sqlSum2(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSum4(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(24,4))) AS DOUBLE)"
}
