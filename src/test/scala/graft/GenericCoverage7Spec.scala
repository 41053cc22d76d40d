package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seventh batch of dedicated invariant specs — empties COVERAGE.md's
  * generic-gates-only list: metadata-column shards, calendar math,
  * PSI non-negativity/additivity, script-transform totality, Goertzel
  * band discrimination, NTZ/LTZ audit liveness, column-default
  * producers, pivot totals, SQL-pipe ≡ DataFrame, scripting-loop
  * replay, parameterized legs, IEEE float-semantics contract, basket
  * lift law, RFM ntile balance + segment mapping, and BFS hop laws
  * over the contamination graph.
  */
class GenericCoverage7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q206: shards are the languages, counts match, row_index starts at 0 per file") {
    val rows = run("q206_file_metadata").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val langN = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == langN.keySet)
    rows.foreach { case (shard, n, byIdx, first) =>
      assert(n == langN(shard), s"$shard row count off")
      assert(first == 0L && byIdx == n, s"$shard row_index not dense from 0")
    }
    val dir = new java.io.File(graft.sources.Sources.scratchLeaf(d, "metadata_docs"))
    assert(dir.listFiles().exists(f => f.isDirectory && f.getName.startsWith("lang=")),
      "no hive-partitioned lang=* directories on disk")
  }

  test("q210: days_in_month is real calendar math and revenue_per_day re-multiplies") {
    val rows = run("q210_calendar_windows").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val want = java.time.YearMonth.of(m.getYear, m.getMonth).lengthOfMonth().toLong
      assert(r.getLong(1) == want, s"$m days_in_month ${r.getLong(1)} != $want")
      assert(math.abs(r.getDouble(4) * want - r.getDouble(3)) < 1e-6,
        s"$m revenue_per_day does not re-multiply to revenue")
    }
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "all months the same length — the calendar leg is vacuous")
  }

  test("q214: PSI terms are non-negative and add to the total; populations partition events") {
    val rows = run("q214_psi_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, _, c, _) =>
      assert(c >= -1e-9, s"bucket $b PSI term negative: $c — (pa-pb) and ln(pa/pb) share sign")
    }
    val total = rows.head._5
    assert(math.abs(rows.map(_._4).sum - total) < 1e-4, "psi_total != sum of contribs")
    assert(total >= 0.0)
    assert(rows.map(r => r._2 + r._3).sum == Tables.events(spark, d).count(),
      "bucket populations don't partition the event stream")
  }

  test("q232: the external process transformed every row (lowercase in, uppercase out)") {
    val rows = run("q232_script_transform").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = Tables.events(spark, d).groupBy(upper(col("event_type")).as("u")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.toMap == exp, "piped counts diverge from upper() recomputation")
    assert(rows.forall(r => r._1 == r._1.toUpperCase && r._1 != r._1.toLowerCase),
      "output not uppercased — the tr pipe did nothing")
  }

  test("q233: the Goertzel detector lights all four bands and tracks the tone closed-form") {
    val rows = run("q233_spectral_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    rows.foreach { case (id, hz, conc) =>
      assert(hz == 500L * (1 + id % 4), s"doc $id dominant $hz != tone")
      assert(conc, s"doc $id tone power not concentrated")
    }
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(500L, 1000L, 1500L, 2000L),
      "fixture does not exercise all four bands")
  }

  test("q234: both timestamp-semantics audits hold and cover every event") {
    val rows = run("q234_timestamp_ntz").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, d).count())
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: LTZ hours did not shift by the NY offset")
      assert(r.getBoolean(3), s"${r.getString(0)}: NTZ wall-clock hours changed across zones")
    }
  }

  test("q235: the default fills exactly the two legacy producers' rows") {
    val rows = run("q235_column_defaults").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val byMod = Tables.orders(spark, d)
      .groupBy((col("o_orderkey") % 3).as("m")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("legacy", "fresh"))
    assert(rows("legacy") == byMod(0L) + byMod(1L),
      "omitted-column and explicit-DEFAULT inserts must both land 'legacy'")
    assert(rows("fresh") == byMod(2L))
  }

  test("q237: pivot cells re-add to the orders total and statuses stay within {F,O,P}") {
    val df = run("q237_pivot_multi")
    val cols = df.columns
    assert(cols.toSet == Set("o_orderpriority", "F_n", "F_rev", "O_n", "O_rev", "P_n", "P_rev"))
    val rows = df.collect()
    val total = rows.map(r =>
      Seq("F_n", "O_n", "P_n").map(c => r.getLong(r.fieldIndex(c))).sum).sum
    assert(total == Tables.orders(spark, d).count(),
      "pivot cells don't partition the orders table")
  }

  test("q246: the pipe syntax computes exactly the DataFrame aggregation it sugars") {
    val piped = run("q246_sql_pipe").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sorted
    val plain = Tables.orders(spark, d)
      .where(col("o_orderstatus") =!= "P")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Q.dsum4(col("o_totalprice") * 0.1).as("sum_tax"),
        Q.dsum4(col("o_totalprice") * 0.1 * 0.5).as("sum_half"))
      .where(col("n") > 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sorted
    assert(piped.nonEmpty && piped.sameElements(plain))
  }

  test("q248: the WHILE loop's (mu, sd, n) replays as four explicit trimming passes") {
    val r = run("q248_sql_scripting").head()
    assert(r.getInt(0) == 4, "loop must run exactly 4 iterations")
    // replay with the query's OWN moment formulas (decimal-exact mean,
    // 1e-4-quantized population sd) — not stddev_samp, whose Bessel
    // correction and summation differ by construction
    var mu = 0.0; var sd = 1e15; var n = 0L
    (1 to 4).foreach { _ =>
      val row = Tables.orders(spark, d)
        .where(col("o_totalprice").between(mu - sd, mu + sd))
        .agg(
          (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / count(lit(1))).as("mu"),
          expr("""CAST(floor(sqrt(CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(30,4)))
                               AS DOUBLE) / count(*)
                 - (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)))
                 * 10000 + 0.5) / 10000.0 AS DOUBLE)""").as("sd"),
          count(lit(1)).as("n"))
        .head()
      mu = row.getDouble(0); sd = row.getDouble(1); n = row.getLong(2)
    }
    assert(r.getLong(1) == n && r.getDouble(2) == mu && r.getDouble(3) == sd,
      s"scripted loop state ${(r.getLong(1), r.getDouble(2), r.getDouble(3))} != replay ${(n, mu, sd)}")
  }

  test("q249: the named parameters and the session variable bind the documented values") {
    val rows = run("q249_parameterized_sql").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val param = rows.filter(_._1 == "param")
    val expParam = Tables.orders(spark, d)
      .where(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(param.map(p => (p._2, p._3)).toMap == expParam)
    val avgF = Tables.orders(spark, d).where(col("o_orderstatus") === "F")
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    val expVar = Tables.orders(spark, d).where(col("o_totalprice") > avgF).count()
    assert(rows.find(_._1 == "session_var").map(_._3).contains(expVar))
  }

  test("q265: the IEEE contract — -0.0 folds into 0.0 and NaN equals NaN in DISTINCT/joins") {
    val legs = run("q265_float_semantics").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val byMod = Tables.orders(spark, d)
      .groupBy((col("o_orderkey") % 4).as("m")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(legs("distinct_values") == 3L, "0.0/-0.0 must collapse; NaN is one distinct value")
    assert(legs("zero_absorbs_negzero") == byMod(0L) + byMod(1L),
      "-0.0 rows must satisfy v = 0.0")
    assert(legs("nan_eq_nan_join") == 1L, "NaN must meet NaN in an equi-join")
  }

  test("q282: lift is the exact support ratio and pairs are ordered with real support") {
    val nOrders = Tables.lineitem(spark, d).select("l_orderkey").distinct().count()
    run("q282_market_basket").collect().foreach { r =>
      val (pa, pb, sup, ca, cb, lift) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(pa < pb && sup >= 2 && sup <= math.min(ca, cb))
      assert(lift == (sup * nOrders).toDouble / (ca * cb).toDouble, "lift law broken")
    }
  }

  test("q286: ntile scores stay in 1..5 with balanced classes; segments follow their thresholds") {
    val rows = run("q286_rfm_segments").collect()
    assert(rows.nonEmpty)
    val n = rows.length
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val scores = rows.map(r => r.getLong(r.fieldIndex(c)))
      assert(scores.forall(s => s >= 1 && s <= 5))
      val sizes = scores.groupBy(identity).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"$c ntile classes unbalanced for n=$n")
    }
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getLong(r.fieldIndex("r_score")),
        r.getLong(r.fieldIndex("f_score")), r.getLong(r.fieldIndex("m_score")))
      val seg = r.getString(r.fieldIndex("segment"))
      if (rs >= 4 && fs >= 4 && ms >= 4) assert(seg == "champion", s"$rs/$fs/$ms -> $seg")
    }
  }

  test("q301: hops are BFS-true over the pair graph — seeds at 0, every hop has a parent") {
    val rows = run("q301_contamination_hops").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hops = rows.toMap
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 4))
    rows.filter(_._2 == 0).foreach { case (id, _) =>
      assert(id % 7 == 0, s"non-seed $id at hop 0")
    }
    val edges = queries.Dedup.minhashPairsArtifact(spark, d)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.filter(_._2 > 0).foreach { case (id, h) =>
      assert(edges.getOrElse(id, Set.empty).exists(nb => hops.get(nb).contains(h - 1)),
        s"doc $id at hop $h has no neighbor at hop ${h - 1}")
    }
    assert(rows.exists(_._2 > 0), "no contamination spread — the hop loop is dead here")
  }
}
