package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fifth batch of dedicated invariant specs for generic-gates-only
  * queries — the statistical singletons and storage/misc stragglers:
  * Benford's χ² additivity and the audit actually firing, MI marginal
  * consistency, Kaplan–Meier monotonicity with live censoring, bounded
  * correlations, z-test algebra, MASE ratio law with the gap guard,
  * LOCF accounting, sweep-line peak laws, cumulative-reach monotone
  * laws, edit-distance/similarity duality, the bloom runtime filter
  * actually in the plan, schema-evolution backfill shape, and BPE pair
  * ranking laws.
  */
class GenericCoverage5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q272: digits complete, fractions sum to 1, chi2 is the term sum — and the audit FIRES") {
    val rows = run("q272_benford_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).sorted.toSeq == (1L to 9L), "a first digit is missing")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "observed fractions don't sum to 1")
    rows.foreach { case (dg, _, _, ef, _, _) =>
      val p = math.log10(1.0 + 1.0 / dg)
      assert(math.abs(ef - p) < 1e-6, s"digit $dg expectation drifted from log10(1+1/d)")
    }
    val chi2 = rows.head._6
    assert(math.abs(rows.map(_._5).sum - chi2) < 1e-6, "chi2 != sum of its terms")
    // the synthetic price column is NOT Benford-distributed — the
    // audit exists to catch exactly this, so it must fire loudly
    assert(chi2 > 20.09, s"chi2=$chi2 under the 8-dof 99% line — the audit is dead here")
  }

  test("q279: marginals re-sum from cells, the MI total is the term sum and non-negative") {
    val rows = run("q279_mutual_information").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6), r.getDouble(7)))
    val bySeg = rows.groupBy(_._1)
    bySeg.foreach { case (seg, cs) =>
      assert(cs.map(_._3).sum == cs.head._4, s"cx of $seg != sum of its cells")
    }
    rows.groupBy(_._2).foreach { case (nat, cs) =>
      assert(cs.map(_._3).sum == cs.head._5, s"cy of $nat != sum of its cells")
    }
    val total = rows.head._7
    assert(math.abs(rows.map(_._6).sum - total) < 1e-8, "mi_total != sum of terms")
    assert(total >= -1e-6, s"plug-in MI must be non-negative, got $total")
  }

  test("q280: survival non-increasing, risk set strictly shrinking, censoring live") {
    val rows = run("q280_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._2 == rows.map(_._4).sum, "first risk set != total users")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 <= a._5 + 1e-9, "survival increased")
        assert(b._2 < a._2, "risk set did not shrink")
      case _ => ()
    }
    assert(rows.map(_._3).sum < rows.map(_._4).sum,
      "no censored users — the KM estimator degenerates to the empirical CDF here")
  }

  test("q284: correlations bounded, upper triangle only, full pair coverage") {
    val rows = run("q284_cross_correlation").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (ta, tb, n, x) =>
      assert(ta < tb, "not upper-triangle")
      assert(n > 0 && math.abs(x) <= 1.0 + 1e-9, s"corr out of range: $x")
    }
    val k = Tables.events(spark, d).select("event_type").distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2, "missing a type pair")
  }

  test("q285: z sign follows the proportion gap; significance is the 1.96 gate; arms partition users") {
    val r = run("q285_ab_proportion_test").head()
    val (n0, n1) = (r.getLong(0), r.getLong(2))
    val (p0, p1, z) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(n0 > 0 && n1 > 0, "an arm is empty")
    assert(n0 + n1 == Tables.events(spark, d).select("user_id").distinct().count())
    assert(math.signum(z) == math.signum(p1 - p0) || z == 0.0)
    assert(r.getBoolean(7) == (math.abs(z) > 1.96))
  }

  test("q289: MASE is exactly the MAE ratio and the gap guard trims the eval window") {
    val rows = run("q289_forecast_backtest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val daysPerType = Tables.events(spark, d)
      .groupBy("event_type").agg(countDistinct(to_date(col("ts"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, nEval, mae1, mae7, mase) =>
      assert(math.abs(mase - mae7 / mae1) < 1e-12, "MASE != mae_seasonal / mae_naive")
      assert(nEval <= daysPerType(t) - 7,
        s"$t: eval window $nEval not trimmed by the 7-day lag guard (${daysPerType(t)} days)")
    }
  }

  test("q241: autocorrelations bounded; n_days is the type's distinct-day count") {
    val rows = run("q241_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val daysPerType = Tables.events(spark, d)
      .groupBy("event_type").agg(countDistinct(to_date(col("ts"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, a1, a7) =>
      assert(n == daysPerType(t))
      assert(math.abs(a1) <= 1.0 + 1e-9 && math.abs(a7) <= 1.0 + 1e-9)
    }
  }

  test("q239: LOCF accounting partitions every user's rows; carried and leading both live") {
    val rows = run("q239_locf_impute").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perUser = Tables.events(spark, d).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (u, nObs, nCarried, nLeading) =>
      assert(nObs + nCarried + nLeading == perUser(u),
        s"user $u: obs+carried+leading != row count")
    }
    assert(rows.exists(_._3 > 0), "no carried-forward rows — LOCF is dead here")
    assert(rows.exists(_._4 > 0), "no leading-null rows — the pre-first-observation path is dead")
  }

  test("q227: the peak is reached at an arrival instant and bounded by the type's volume") {
    val rows = run("q227_peak_concurrency").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2).getTime))
    val ev = Tables.events(spark, d)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val byType = ev.groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (t, peak, peakT) =>
      assert(peak >= 1 && peak <= byType(t).length)
      assert(byType(t).exists(_._2 == peakT),
        s"$t peak instant $peakT is not an arrival time — a -1 delta cannot raise the count")
      // independent sweep recount at the claimed instant
      val live = byType(t).count(e => e._2 <= peakT && peakT < e._2 + 10 * 60 * 1000L)
      assert(live == peak, s"$t: recounted $live concurrent at peak, query says $peak")
    }
    assert(rows.exists(_._2 >= 2), "every peak is 1 — concurrency never overlaps here")
  }

  test("q275: reach is monotone, dominates day_users, and ends at the type's distinct users") {
    val rows = run("q275_cumulative_reach").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val totals = Tables.events(spark, d)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (t, days) =>
      val s = days.sortBy(_._2)
      s.foreach { case (_, _, du, reach) => assert(du <= reach && du >= 1) }
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 >= a._4, s"$t reach decreased")
          assert(b._4 <= a._4 + b._3, s"$t reach grew more than the day's users")
        case _ => ()
      }
      assert(s.last._4 == totals(t), s"$t final reach != distinct users")
    }
  }

  test("q69: distance/similarity duality holds and the near-dup pairs genuinely differ") {
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("q69_edit_distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, dist, sim) =>
      val mx = math.max(docs(a).length, docs(b).length)
      assert(math.abs(sim - (1.0 - dist.toDouble / mx)) < 1e-12, "duality broken")
      assert(dist >= math.abs(docs(a).length - docs(b).length),
        "edit distance below the length-difference lower bound")
    }
    assert(rows.exists(_._3 > 0), "all pairs identical — near-dup (not exact-dup) path untested")
  }

  test("q92: the runtime bloom filter is IN the executed plan and broadcast stayed off") {
    val df = run("q92_bloom_join")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom runtime filter in the executed plan:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast join crept back in — the bloom demonstration is vacuous")
  }

  test("q102: the merged schema backfills NULL quality exactly for the old-generation rows") {
    val rows = run("q102_schema_evolution").collect()
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "n_chars", "quality"))
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) assert(r.isNullAt(3), s"old-file row $id has a quality value")
      else assert(!r.isNullAt(3) &&
        math.abs(r.getDouble(3) - r.getLong(2).toDouble / 100.0) < 1e-12,
        s"new-file row $id quality wrong")
    }
    assert(rows.length == Tables.documents(spark, d).count())
  }

  test("q100: the top-50 BPE pairs are rank-ordered with the pair tiebreak, counts positive") {
    val rows = run("q100_bpe_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 50)
    assert(rows.forall(_._2 > 0))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1),
          s"ordering broken between $a and $b")
      case _ => ()
    }
    assert(rows.map(_._1).distinct.length == 50, "a pair repeats in the top-50")
  }
}
