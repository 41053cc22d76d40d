package graft

import org.scalatest.funsuite.AnyFunSuite

/** q277 contracts the hash oracle can't see:
  *
  *   - PLAN: both rankings and the final fused top-10 are windows over
  *     the SAME partition key (probe_id), so the executed plan carries
  *     exactly ONE shuffle exchange — the naive spelling (rank each
  *     list separately, full-outer join them back) would shuffle three
  *     times and re-scan the scored pass twice.
  *   - FUSION SEMANTICS: an item present in only one ranker's top-20
  *     still competes (contributing a single 1/(60+r) term) — that is
  *     the property that distinguishes RRF from intersection-style
  *     fusion, and the fixture proves it fires on real data.
  */
class RrfFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q277: one exchange feeds both rankings and the fused rank") {
    val df = queries.Similarity.rrfFusion.fn(spark, d)
    df.collect()
    // AQE's toString prints Final AND Initial plans — gate the final only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "fusion must not join ranked lists back together")
  }

  test("q277: single-list members compete and fused order is the RRF sum") {
    val rows = queries.Similarity.rrfFusion.fn(spark, d).collect()
    assert(rows.nonEmpty)
    // every probe serves exactly 10 fused results
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    perProbe.foreach { case (p, rs) =>
      assert(rs.length == 10, s"probe $p served ${rs.length} rows")
    }
    // fused score recomputes from the rank columns
    rows.foreach { r =>
      val rc = r.getAs[Long]("r_cos"); val rd = r.getAs[Long]("r_dot")
      val expect = (if (rc > 0) 1.0 / (60.0 + rc) else 0.0) +
        (if (rd > 0) 1.0 / (60.0 + rd) else 0.0)
      assert(r.getAs[Double]("rrf_score") == expect)
      assert(rc > 0 || rd > 0, "a fused row must come from at least one list")
    }
    // the distinguishing case exists in the fixture: some surfaced row
    // is absent from one ranker's top-20 (r == 0) yet made the top-10
    assert(rows.exists(r => r.getAs[Long]("r_cos") == 0L || r.getAs[Long]("r_dot") == 0L),
      "fixture never exercised single-list fusion — RRF would be indistinguishable from intersection")
  }
}
