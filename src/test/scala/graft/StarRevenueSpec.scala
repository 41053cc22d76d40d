package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q161 plan-shape independence: the same Q5 semantics rebuilt in a
  * DIFFERENT join order (facts first, dims last) on a session with
  * broadcasts force-disabled (every join a shuffle join) must agree
  * row-for-row — the result is a property of the relational semantics,
  * not of the join strategy AQE happened to pick. Also pins that the
  * region filter actually restricts the output nations to ASIA's.
  */
class StarRevenueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q161 is invariant to join order and strategy") {
    val got = SparkEntry.queries("q161_star_revenue")(spark, d).collect()
      .map(r => r.getAs[String]("n_name") ->
        ((r.getAs[Long]("n_items"), r.getAs[Double]("revenue"))))
      .toMap

    val ses = spark.newSession()
    ses.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val l = Tables.lineitem(ses, d)
    val o = Tables.orders(ses, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(ses, d)
    val su = Tables.supplier(ses, d)
    val n = Tables.nation(ses, d)
    val r = Tables.region(ses, d).where(col("r_name") === "ASIA")
    val alt = l.join(su, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("c_custkey") === col("o_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"),
        Q.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    val expected = alt.collect()
      .map(row => row.getAs[String]("n_name") ->
        ((row.getAs[Long]("n_items"), row.getAs[Double]("revenue"))))
      .toMap

    assert(got == expected)
    assert(got.nonEmpty)
    val asiaNations = Tables.nation(spark, d)
      .join(Tables.region(spark, d).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(got.keySet.subsetOf(asiaNations))
  }
}
