package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third batch of dedicated invariant specs for generic-gates-only
  * queries: string-transform round trips, try_cast totality, map-HOF
  * filtering, ordered-set membership, secondary-sort run laws, FILTER
  * clause ≡ CASE twin, and the 30-day RANGE frame's self-inclusion.
  */
class GenericCoverage3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, d)

  test("q56: devoweling removes every vowel; lpad is 8 wide; reverse is an involution") {
    val out = run("q56_string_transforms").collect()
    out.foreach { r =>
      assert(!r.getString(1).exists("aeiou".contains(_)), "vowel survived devoweling")
      assert(r.getString(4).length == 8 && r.getString(4).forall(c =>
        c.isDigit), s"key_padded malformed: ${r.getString(4)}")
      assert(r.getString(3) == "pad", "trim broke")
    }
    val src = Tables.part(spark, d).select("p_partkey", "p_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getString(5).reverse == src(r.getLong(0)), "reverse not an involution")
    }
  }

  test("q198: try_cast is total — ints parse both ways, decimals only as double, junk as neither") {
    run("q198_try_cast").collect().foreach { r =>
      val (id, raw) = (r.getLong(0), r.getString(1))
      (id % 5) match {
        case 0 =>
          assert(r.getLong(2) == id && r.getDouble(3) == id.toDouble)
          assert(!r.getBoolean(4))
        case 1 =>
          assert(r.isNullAt(2), "decimal string parsed as BIGINT")
          assert(r.getDouble(3) == id + 0.25)
          assert(!r.getBoolean(4))
        case _ =>
          assert(r.isNullAt(2) && r.isNullAt(3), s"junk '$raw' parsed")
          assert(r.getBoolean(4))
      }
    }
  }

  test("q207: busy_types lists exactly the user's types with n >= 2, as n/cents pairs") {
    val exp = Tables.events(spark, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.filter(_._3 >= 2).toSeq.sortBy(_._2)
          .map(t => s"${t._2}=${t._3}/${t._4}").mkString(",")
      }
    val out = run("q207_map_functions").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == exp, "map-HOF roster diverges from the relational replay")
    assert(out.values.exists(_.nonEmpty), "every roster empty — map_filter killed all")
  }

  test("q212: percentile_disc values are members; p50 <= p90; roster is sorted distinct") {
    val vals = Tables.events(spark, d)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).toSet }
    run("q212_ordered_set_aggs").collect().foreach { r =>
      val t = r.getString(0)
      val (p50, p90) = (r.getDouble(1), r.getDouble(2))
      assert(vals(t).contains(p50) && vals(t).contains(p90),
        s"$t: percentile_disc not a member")
      assert(p50 <= p90, s"$t: p50 > p90")
      val roster = r.getString(3).split(",").toSeq
      assert(roster == roster.distinct.sorted, s"$t: roster not sorted distinct")
    }
  }

  test("q238: best increasing run is within [1, n] and matches a replay") {
    val ev = Tables.events(spark, d)
      .selectExpr("user_id", "value", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._4)).map(_._2)
      var run = 0L; var best = 0L; var prev = Double.NaN
      sorted.foreach { v =>
        run = if (run > 0 && v > prev) run + 1 else 1
        if (run > best) best = run
        prev = v
      }
      u -> ((sorted.length.toLong, best))
    }
    val out = run("q238_secondary_sort").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == exp, "secondary-sort run replay diverges")
    assert(out.values.exists(_._2 >= 2L), "no increasing run of 2 — order never mattered")
  }

  test("q263: FILTER clause equals its CASE twin column-for-column") {
    run("q263_filter_clause").collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(5), "count FILTER != count CASE")
      assert((r.isNullAt(3) && r.isNullAt(6))
        || r.getDouble(3) == r.getDouble(6), "sum FILTER != sum CASE")
      assert(r.getLong(2) <= r.getLong(1), "filtered count exceeds group size")
    }
  }

  test("q54: the 30-day RANGE frame includes its own row; frame never exceeds the partition") {
    val out = run("q54_range_frame").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val perCust = Tables.orders(spark, d).groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val price = Tables.orders(spark, d).selectExpr("o_orderkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (ok, ck, n30, spend) =>
      assert(n30 >= 1L && n30 <= perCust(ck), s"$ok: frame size out of bounds")
      assert(spend >= price(ok) - 1e-6, s"$ok: frame sum below the row's own price")
    }
    assert(out.exists(_._3 > 1L), "every frame is a singleton — RANGE never grouped")
  }
}
