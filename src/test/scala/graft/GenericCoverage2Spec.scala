package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Second batch of dedicated invariant specs for generic-gates-only
  * queries (see GenericCoverageSpec): multiset laws, calendar
  * completeness, grouping-id bit math, moment inequalities, streak and
  * drawdown bounds, Zipf shape.
  */
class GenericCoverage2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q55: exceptAll is the multiset difference max(cntL - cntR, 0)") {
    val l = Tables.lineitem(spark, d).select(col("l_suppkey")).collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length }
    val r = Tables.supplier(spark, d).select(col("s_suppkey")).collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = l.map { case (k, n) => k -> (n - r.getOrElse(k, 0)).toLong }
      .filter(_._2 > 0)
    val out = run("q55_except_all").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == expected, "exceptAll diverges from the multiset law")
  }

  test("q66: the spine is gap-free per type; zero-filled hours really had no events") {
    val out = run("q66_gapfill").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val byType = out.groupBy(_._2)
    val hours = byType.values.head.map(_._1.getTime).distinct.sorted
    byType.values.foreach { rows =>
      val hs = rows.map(_._1.getTime).distinct.sorted.toSeq
      assert(hs.length == hours.length, "types disagree on the spine")
      hs.sliding(2).foreach {
        case Seq(a, b) => assert(b - a == 3600000L, "hourly spine has a gap")
        case _ =>
      }
    }
    assert(out.map(_._3).sum == Tables.events(spark, d).count(),
      "gap-filled counts do not conserve events")
    assert(out.exists(_._3 == 0L), "no zero-filled hour at sf0.001 — gapfill vacuous")
  }

  test("q221: grouping_id = 2*g_prio + g_status; row_kind matches the bits; totals nest") {
    val out = run("q221_grouping_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6)))
    out.foreach { case (gp, gs, gid, kind, _) =>
      assert(gid == 2 * gp + gs, s"grouping_id bit math broken: $gp $gs $gid")
      val expected = if (gid == 3) "total" else if (gs == 1) "subtotal" else "detail"
      assert(kind == expected, s"row_kind $kind != $expected for gid $gid")
    }
    val total = out.filter(_._3 == 3L).map(_._5)
    assert(total.length == 1 && total.head == Tables.orders(spark, d).count(),
      "grand total row wrong")
    assert(out.filter(_._3 == 1L).map(_._5).sum == total.head,
      "subtotals do not sum to the grand total")
  }

  test("q228: excess kurtosis >= skew^2 - 2 (the moment inequality) per group") {
    run("q228_higher_moments").collect().foreach { r =>
      val (sq, kq, sp, kp) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(kq >= sq * sq - 2 - 1e-6, s"qty moments violate kurt >= skew²-2: $sq $kq")
      assert(kp >= sp * sp - 2 - 1e-6, s"price moments violate the inequality: $sp $kp")
    }
  }

  test("q276: best streak <= active days; streak count partitions active days") {
    val active = Tables.events(spark, d)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day").distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).toSet }
    val out = run("q276_longest_streak").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getLong(3), r.getLong(4)))
    assert(out.length == active.size)
    out.foreach { case (u, best, start, nStreaks, activeDays) =>
      val days = active(u)
      assert(activeDays == days.size.toLong, s"$u: active days diverge")
      assert(best >= 1L && best <= activeDays, s"$u: streak out of bounds")
      assert(nStreaks >= 1L && nStreaks <= activeDays)
      // the reported best streak really is consecutive from its start
      (0L until best).foreach(i => assert(days.contains(start.plusDays(i)),
        s"$u: best streak not consecutive at $start+$i"))
      assert(!days.contains(start.minusDays(1)), s"$u: streak start not maximal")
    }
  }

  test("q278: gini in [0,1); zero only if all spends equal; mass conserved") {
    val out = run("q278_gini_concentration").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    out.foreach { case (seg, n, total, g) =>
      assert(g >= 0.0 && g < 1.0, s"$seg: gini $g out of range")
      assert(n > 0 && total > 0.0)
    }
    assert(out.exists(_._4 > 0.05), "every segment near-perfectly equal — gini vacuous")
  }

  test("q281: max drawdown in [0,1); its day is on or after the running peak") {
    val out = run("q281_max_drawdown").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDate(2), r.getDouble(3)))
    out.foreach { case (t, dd, _, peak) =>
      assert(dd >= 0.0 && dd < 1.0, s"$t: drawdown $dd out of [0,1)")
      assert(peak > 0.0)
    }
    assert(out.exists(_._2 > 0.0), "no drawdown anywhere — metric vacuous")
  }

  test("q287: rank-ordered fit laws — slope <= 0, r2 in [0,1], top_freq is the true max") {
    val r = run("q287_zipf_fit").head()
    val (nTop, slope, r2, topFreq) =
      (r.getLong(0), r.getDouble(1), r.getDouble(3), r.getLong(4))
    // the synthetic vocabulary is smaller than the top-100 cap at
    // sf0.001 (31 distinct words) — require enough points for the fit;
    // and the corpus is near-uniform, so the LAW is about the
    // estimator (frequencies non-increasing in rank force slope <= 0),
    // not about the corpus being Zipfian
    assert(nTop >= 20L, s"only $nTop ranked words — fit underdetermined")
    assert(slope <= 0.0, s"slope $slope positive on a rank-ordered series")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 out of range")
    val trueMax = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").groupBy("w").count()
      .agg(max("count")).head().getLong(0)
    assert(topFreq == trueMax, s"top_freq $topFreq != true max frequency $trueMax")
  }
}
