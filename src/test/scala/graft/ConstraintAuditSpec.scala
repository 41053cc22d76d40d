package graft

import org.scalatest.funsuite.AnyFunSuite

/** q146 constraint-audit differential: restage the dirty load in plain
  * Scala collections and recount every constraint class independently of
  * both engines' join/aggregate machinery; pin the audit identities
  * (violated ≤ checked, all five rules present, every class fires on the
  * staged fixture — key 0 exists, so even the %500 double-load does).
  */
class ConstraintAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q146 matches a plain-Scala restaging of the dirty load") {
    val customers = Tables.customer(spark, d).select("c_custkey").collect()
      .map(_.getLong(0))
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lineitems = Tables.lineitem(spark, d)
      .selectExpr("l_orderkey", "cast(l_linenumber as long)", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val custS = customers ++ customers.filter(_ % 500 == 0)
    val ordS = orders.filter(_._1 % 131 != 0)
      .map { case (ok, ck) => (ok, if (ok % 97 == 0) ck + 1000000000L else ck,
        if (ok % 89 == 0) null else "prio") }
    val liS = lineitems.map { case (ok, ln, q) =>
      (ok, if ((ok + ln) % 101 == 0) -q else q) }

    val custKeys = custS.toSet
    val ordKeys = ordS.map(_._1).toSet
    val expected = Map(
      "orders.o_custkey->customer" ->
        ((ordS.count(o => !custKeys.contains(o._2)).toLong, ordS.length.toLong)),
      "lineitem.l_orderkey->orders" ->
        ((liS.count(l => !ordKeys.contains(l._1)).toLong, liS.length.toLong)),
      "customer.c_custkey_unique" ->
        ((custS.groupBy(identity).values.map(_.length - 1L).sum, custS.length.toLong)),
      "lineitem.l_quantity_range" ->
        ((liS.count(l => l._2 < 1 || l._2 > 50).toLong, liS.length.toLong)),
      "orders.o_orderpriority_not_null" ->
        ((ordS.count(_._3 == null).toLong, ordS.length.toLong)))

    val out = SparkEntry.queries("q146_constraint_audit")(spark, d).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("violated"), r.getAs[Long]("checked")))).toMap

    assert(out == expected)
    out.values.foreach { case (v, c) => assert(v <= c) }
    assert(out.values.forall(_._1 > 0), "every constraint class must fire")
  }
}
