package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q268 contract — the runtime re-plan the row-count oracle can't see:
  *   (a) the INITIAL plan is a SortMergeJoin (static threshold −1 — the
  *       static planner genuinely could not broadcast);
  *   (b) the FINAL executed plan is a BroadcastHashJoin (AQE demoted
  *       using the real post-filter shuffle size);
  *   (c) the counterfactual: with AQE off, the SMJ persists to
  *       execution — the demotion was AQE's doing, not a static rule.
  */
class AqeDemotionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q268: runtime stats demote SMJ to broadcast; AQE-off keeps SMJ") {
    val s = queries.Relational2.demotionSession(spark)
    val df = queries.Relational2.demotedJoin(s, d)
    val initial = df.queryExecution.executedPlan.toString
    assert(initial.contains("SortMergeJoin") || initial.contains("isFinalPlan=false"),
      s"initial plan already broadcast — static threshold leaked:\n$initial")
    df.collect()
    val whole = df.queryExecution.executedPlan.toString
    assert(whole.contains("isFinalPlan=true"), s"no AQE final plan:\n$whole")
    // AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial
    // Plan ==" — judge only the final section (the initial one is
    // SUPPOSED to contain the SMJ)
    val fin = whole.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"AQE did not demote the join to broadcast:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"final plan still sort-merge joins:\n$fin")
    assert(whole.contains("SortMergeJoin"),
      s"initial plan never had the SMJ — the demotion proved nothing:\n$whole")

    val sOff = spark.newSession()
    sOff.conf.set("spark.sql.adaptive.enabled", "false")
    sOff.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dfOff = queries.Relational2.demotedJoin(sOff, d)
    dfOff.collect()
    val off = dfOff.queryExecution.executedPlan.toString
    assert(off.contains("SortMergeJoin") && !off.contains("BroadcastHashJoin"),
      s"counterfactual failed — SMJ expected without AQE:\n$off")
  }
}
