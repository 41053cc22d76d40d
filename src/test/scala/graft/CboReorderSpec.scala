package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cost-based JOIN REORDER gate — the consumption side of q226's
  * catalog statistics (BucketSpec pins that CBO sees the analyzed row
  * count; this pins that the optimizer ACTS on it). Three cataloged,
  * ANALYZEd tables joined in a deliberately bad syntactic order
  * (fact ⋈ fact first, selective dim last): with
  * `spark.sql.cbo.joinReorder.enabled` the optimized plan must join
  * the selective dim BEFORE paying the fact-fact blowup, and the
  * result must be bit-identical to the unreordered plan — reordering
  * is a physics change, never a semantics change.
  */
class CboReorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def activeStats[A](s: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val prev = org.apache.spark.sql.classic.SparkSession.getActiveSession
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    try f
    finally prev.foreach(org.apache.spark.sql.classic.SparkSession.setActiveSession)
  }

  /** Left-deep leaf order of the optimized plan's join tree: the
    * sequence of relation names as they appear left-to-right.
    */
  private def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan: LogicalPlan = df.queryExecution.optimizedPlan
    plan.collectLeaves().collect {
      case l: LogicalRelation =>
        l.catalogTable.map(_.identifier.table).getOrElse("?")
      case h: HiveTableRelation => h.tableMeta.identifier.table
    }
  }

  private def registered(s: org.apache.spark.sql.SparkSession, name: String,
      df: org.apache.spark.sql.DataFrame, keys: String): String = {
    val tbl = name + "_" + java.lang.Integer.toHexString(d.hashCode)
    if (!s.catalog.tableExists(tbl)) {
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("path", graft.sources.Sources.scratchLeaf(d, name))
        .saveAsTable(tbl)
    }
    s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS $keys")
    tbl
  }

  test("join reorder pulls the selective dim ahead of the fact-fact join") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val ev = Tables.events(s, d).select("event_id", "user_id", "event_type")
    val facts = registered(s, "cbo_events", ev, "user_id, event_type")
    val sides = registered(s, "cbo_sides",
      ev.select(col("event_id").as("side_id"), col("user_id")), "user_id")
    val dim = registered(s, "cbo_dim",
      ev.select("event_type").distinct().limit(2), "event_type")

    // deliberately bad syntactic order: fact ⋈ fact on user_id (a blowup),
    // selective dim last
    val q = s"""SELECT count(*) AS n
                FROM $facts f
                JOIN $sides x ON x.user_id = f.user_id
                JOIN $dim t ON t.event_type = f.event_type"""

    val (orderCbo, nCbo) = activeStats(s) {
      val df = s.sql(q)
      (leafOrder(df), df.collect().head.getLong(0))
    }

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.cbo.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (orderOff, nOff) = activeStats(s2) {
      val df = s2.sql(q)
      (leafOrder(df), df.collect().head.getLong(0))
    }

    assert(nCbo == nOff, "reorder changed the answer")
    assert(orderOff.indexWhere(_.startsWith("cbo_dim")) == 2,
      s"without CBO the syntactic order must hold: $orderOff")
    assert(orderCbo.indexWhere(_.startsWith("cbo_dim")) < 2,
      s"CBO did not pull the selective dim ahead of the fact-fact join: $orderCbo")
  }

  test("q309's registered plan pulls the dim ahead — the gate query exercises the reorder") {
    // the driver's hash gate proves q309's ANSWER; this proves the
    // registered query's PLAN actually rode the stats-driven reorder
    // (a correct answer through the syntactic order would be vacuous)
    val df = SparkEntry.queries("q309_cbo_reorder")(spark, d)
    val order = activeStats(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.SparkSession])(leafOrder(df))
    assert(order.indexWhere(_.startsWith("cbo_dim")) < 2,
      s"q309 did not reorder the selective dim inward: $order")
  }
}
