package graft

import org.scalatest.funsuite.AnyFunSuite

/** q321/q322 differentials: replay the rank-selected QQ ventile table
  * and the 10 % trimmed mean in plain Scala; pin the semantics — QQ
  * values are MEMBERS of their samples and monotone in q, the trimmed
  * estimator really dropped 2·(n div 10) rows, and trimming moved the
  * estimate on this fixture (the tails were load-bearing).
  */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def cents(tpe: String): Seq[(Long, Long)] =
    Tables.events(spark, d)
      .where(org.apache.spark.sql.functions.col("event_type") === tpe)
      .selectExpr("event_id", "CAST(floor(value * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getLong(1), r.getLong(0))).sortBy(identity).toSeq

  test("q321 matches a rank-selected replay; QQ values are sample members, monotone in q") {
    val (va, vb) = (cents("view"), cents("purchase"))
    val expected = (1L to 19L).map { q =>
      val sa = va(((q * va.length + 19) / 20).toInt - 1)._1
      val sb = vb(((q * vb.length + 19) / 20).toInt - 1)._1
      (q, va.length.toLong, vb.length.toLong, sa, sb, sb - sa)
    }
    val out = SparkEntry.queries("q321_qq_ventiles")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(out == expected)
    // monotone curves, values from the actual samples
    assert(out.map(_._4) == out.map(_._4).sorted && out.map(_._5) == out.map(_._5).sorted)
    val (setA, setB) = (va.map(_._1).toSet, vb.map(_._1).toSet)
    out.foreach { r => assert(setA(r._4) && setB(r._5), s"ventile ${r._1} not a member") }
  }

  test("q322 matches a trimmed-mean replay; trimming dropped rows and moved the estimate") {
    val out = SparkEntry.queries("q322_trimmed_mean")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    val types = Tables.events(spark, d).select("event_type").distinct()
      .collect().map(_.getString(0))
    assert(out.keySet == types.toSet)
    types.foreach { tpe =>
      val vs = cents(tpe)
      val n = vs.length.toLong
      val lo = n / 10
      val kept = vs.slice(lo.toInt, (n - lo).toInt)
      val expTrim = kept.map(_._1).sum.toDouble / kept.length.toDouble
      val expRaw = vs.map(_._1).sum.toDouble / n.toDouble
      val (gn, gk, gt, gr) = out(tpe)
      assert(gn == n && gk == n - 2 * lo)
      assert(gt == expTrim && gr == expRaw, s"$tpe: estimator replay mismatch")
      assert(lo > 0, s"$tpe: nothing trimmed at sf0.001 — vacuous")
    }
    // the tails were load-bearing for at least one type
    assert(out.values.exists { case (_, _, t, r) => t != r },
      "trimmed == raw everywhere — fixture tails carry no signal")
  }
}
