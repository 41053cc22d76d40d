package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q260 contract — keyset pagination's three claims:
  *   (a) equivalence: the keyset walk produces row-for-row the same
  *       pages as SQL OFFSET/LIMIT over the same total order;
  *   (b) page discipline: pages are exactly PageSize rows, mutually
  *       disjoint, and internally ordered;
  *   (c) the economics: the page-2+ cursor predicate reaches the
  *       parquet scan as a pushed filter (PushedFilters on
  *       o_totalprice/o_orderkey), which is what makes deep pages
  *       O(k) — OFFSET's plan has no such filter to push.
  */
class PaginationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q260: keyset pages equal OFFSET pages row-for-row") {
    val keyset = queries.Relational2.keysetPagination.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val k = queries.Relational2.PageSize
    Tables.orders(spark, d).createOrReplaceTempView("pg_orders")
    val viaOffset = (1 to queries.Relational2.Pages).flatMap { page =>
      spark.sql(
        s"""SELECT o_orderkey, o_totalprice FROM pg_orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT $k OFFSET ${(page - 1) * k}""").collect()
        .map(r => (page.toLong, r.getLong(0), r.getDouble(1)))
    }
    assert(keyset.toSeq === viaOffset,
      "keyset walk diverged from OFFSET pagination")
    // page discipline
    val byPage = keyset.groupBy(_._1)
    assert(byPage.size === queries.Relational2.Pages)
    byPage.values.foreach(p => assert(p.length === k))
    assert(keyset.map(_._2).distinct.length === keyset.length,
      "pages overlap: an order id appears twice")
  }

  test("q260: the cursor predicate is pushed to the parquet scan") {
    val page1 = queries.Relational2.keysetPage(spark, d, None).collect()
    val cursor = (page1.last.getDouble(1), page1.last.getLong(0))
    val page2 = queries.Relational2.keysetPage(spark, d, Some(cursor))
    val plan = page2.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters in the page-2 plan:\n$plan")
    val pushed = plan.split("PushedFilters: ")(1).split("]")(0)
    assert(pushed.contains("o_totalprice"),
      s"cursor predicate not pushed to the scan: $pushed")
    assert(plan.contains("TakeOrderedAndProject"),
      "page is not a top-k — a full sort would defeat the pattern")
  }
}
