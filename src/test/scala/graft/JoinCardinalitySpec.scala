package graft

import org.scalatest.funsuite.AnyFunSuite

/** q319 join-cardinality differential: the audit's one non-negotiable
  * property is HONESTY — the predicted row count must equal the row
  * count the real join actually produces. This spec runs the join the
  * audit prices and compares, then replays the full profile in plain
  * Scala.
  */
class JoinCardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q319's predicted join size equals the executed join's row count") {
    val r = SparkEntry.queries("q319_join_cardinality_audit")(spark, d).collect().head
    val actual = Tables.orders(spark, d).join(Tables.customer(spark, d),
      org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey")).count()
    assert(r.getDouble(6) == actual.toDouble,
      s"audit predicted ${r.getDouble(6)} rows, join produced $actual")

    // full profile replay
    val lk = Tables.orders(spark, d).select("o_custkey").collect().map(_.getLong(0))
    val rk = Tables.customer(spark, d).select("c_custkey").collect().map(_.getLong(0))
    val nl = lk.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nr = rk.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val keys = nl.keySet ++ nr.keySet
    assert(r.getLong(0) == keys.size.toLong)
    assert(r.getLong(1) == keys.count(k => nl.contains(k) && nr.contains(k)).toLong)
    assert(r.getLong(2) == keys.count(k => nl.contains(k) && !nr.contains(k)).toLong)
    assert(r.getLong(3) == keys.count(k => !nl.contains(k) && nr.contains(k)).toLong)
    assert(r.getLong(4) == nl.values.max && r.getLong(5) == nr.values.max)
    // orders→customer is the canonical N:1 (custkey unique on the dim)
    assert(r.getString(7) == "N:1", s"relationship ${r.getString(7)}")
  }
}
