package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedicated invariant specs for queries COVERAGE.md flagged as covered
  * only by the generic gates (the all-registry oracle compare and
  * PlanSpec's plan loop). Each test pins a semantic law against the
  * query's OWN inputs, recomputed independently — the laws survive data
  * regeneration where a pinned value would not.
  */
class GenericCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q53: variance = stddev² (to rounding); corr in [-1,1]; covar sign matches corr") {
    run("q53_stats_agg").collect().foreach { r =>
      val (sd, v, c, cv) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(sd * sd - v) < 1e-4, s"stddev²≠var: $sd² vs $v")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
      assert(c.sign == cv.sign, s"corr/covar sign mismatch: $c vs $cv")
    }
  }

  test("q57: full outer covers every customer exactly once; aggregate side never orphans") {
    val out = run("q57_outer_join").collect()
    val nCust = Tables.customer(spark, d).count()
    // every base customer appears; the aggregate is keyed BY customers
    // with qualifying orders, so no -1 (right-orphan) rows can exist
    assert(out.count(_.getLong(0) != -1L) == nCust, "customer side not fully preserved")
    assert(!out.exists(_.getLong(0) == -1L), "orphaned aggregate row — join key broken")
    val expectedBig = Tables.orders(spark, d)
      .where(col("o_totalprice") > 250000.0).count()
    assert(out.map(_.getLong(2)).sum == expectedBig, "n_big mass not conserved")
  }

  test("q58: dense_rank gap-free per partition; percent_rank/cume_dist laws; ntile balanced") {
    val rows = run("q58_rank_funcs").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).values.foreach { part =>
      val dr = part.map(_._2).toSet
      assert(dr == (1L to dr.max).toSet, "dense_rank has gaps")
      val n = part.length
      part.foreach { case (_, _, q, pr, cd) =>
        assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
        assert(q >= 1L && q <= 4L)
      }
      assert(part.map(_._4).max == (if (n == 1) 0.0 else 1.0) || n == 1)
      assert(part.map(_._5).max == 1.0, "cume_dist never reaches 1")
      // ntile balance: bucket sizes differ by at most 1
      val sizes = part.groupBy(_._3).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"ntile unbalanced: $sizes")
    }
  }

  test("q68: unpivot fans each priority to exactly 3 rows; counts conserve orders") {
    val out = run("q68_unpivot").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val prios = out.map(_._1).distinct
    prios.foreach { p =>
      assert(out.count(_._1 == p) == 3, s"$p: expected F/O/P rows")
    }
    assert(out.map(_._3).sum == Tables.orders(spark, d).count(),
      "unpivoted counts do not conserve total orders")
  }

  test("q240: every released cell has n >= k; suppressed mass pools under '*'") {
    val out = run("q240_k_anonymity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
    out.foreach { case (nat, seg, n, anon) =>
      if (nat != "*" || seg != "*")
        assert(n >= 10L, s"released cell ($nat,$seg) under k: $n")
      assert(anon == (n >= 10L), "audit bit inconsistent with n")
    }
    assert(out.map(_._3).sum == Tables.customer(spark, d).count(),
      "release does not conserve the population")
    // suppression is live on the fixture: a '*' row exists
    assert(out.exists(r => r._1 == "*" && r._2 == "*"),
      "no suppressed cell at sf0.001 — k-anonymity never triggered")
  }

  test("q274: GROUP BY ALL binds the computed year, not the timestamp") {
    val out = run("q274_group_by_all").collect()
    // grouping by the computed yr: key cardinality equals the explicit twin
    val explicitN = Tables.orders(spark, d)
      .groupBy(col("o_orderstatus"), year(col("o_orderdate")), col("o_orderpriority"))
      .count().count()
    assert(out.length.toLong == explicitN,
      "GROUP BY ALL cardinality diverges from the explicit grouping")
    assert(out.map(_.getLong(3)).sum == Tables.orders(spark, d).count())
  }

  test("q283: transpose yields one row per metric and one column per flag") {
    val out = run("q283_transpose")
    val flags = Tables.lineitem(spark, d)
      .select(col("l_returnflag")).distinct().collect().map(_.getString(0)).sorted
    assert(out.columns.toSeq == Seq("metric") ++ flags,
      s"transpose columns ${out.columns.toSeq} != metric + sorted flags")
    assert(out.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("n_rows", "n_supp", "sum_qty"), "metric rows drifted")
  }
}
