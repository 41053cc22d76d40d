package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join contracts:
  *   - q147 ≡ q42 row-for-row — the custom physical operator and the
  *     running-max window composition implement the same semantics;
  *   - the executed plan actually contains AsOfJoinExec, the two hash
  *     exchanges + sorts EnsureRequirements must insert for the declared
  *     distribution/ordering, and NO Window node;
  *   - closed-form fixtures for the merge edge cases: no right row for a
  *     key (null match), right rows only after the left ts (null match),
  *     exact ts equality (matches — "at-or-before"), multiple left rows
  *     sharing the latest right row, and a right-heavy tail never
  *     consumed.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q147 native as-of equals q42's window composition") {
    def rows(q: String) = SparkEntry.queries(q)(spark, d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[java.sql.Timestamp]("prev_click_ts")))
      .toSet
    val native = rows("q147_asof_native")
    val window = rows("q42_asof_join")
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("q147 plan: AsOfJoinExec with planner-inserted exchanges/sorts, no Window") {
    val p = SparkEntry.queries("q147_asof_native")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), "native as-of fell back to a window")
    assert("hashpartitioning".r.findAllIn(p).size >= 2,
      s"expected both sides hash-partitioned:\n$p")
    assert(p.contains("Sort "), "expected planner-inserted sorts")
  }

  test("merge edge cases on closed-form fixtures") {
    val ses = AsOfJoin.session(spark)
    import ses.implicits._
    // left: (key, ts, tag)   right: (key, ts, payload)
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "c"),
      (2L, 5L, "d"),                 // right rows exist only AFTER ts 5
      (3L, 9L, "e"),                 // no right rows for key 3 at all
      (4L, 7L, "f"), (4L, 8L, "g")   // both share the single right row at 7
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 30L, "r30"),
      (2L, 6L, "r6"), (2L, 7L, "r7"),
      (4L, 7L, "r7b"),
      (5L, 1L, "never")              // key with no left rows
    ).toDF("rk", "rt", "payload")
    val out = AsOfJoin(left, right, "k", "t", "rk", "rt")
      .collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("payload")))
      .toMap
    assert(out == Map(
      "a" -> Some("r10"), // exact equality matches (at-or-before)
      "b" -> Some("r15"),
      "c" -> Some("r15"), // r30 is in the future
      "d" -> None,        // all right rows later
      "e" -> None,        // key absent on the right
      "f" -> Some("r7b"), "g" -> Some("r7b")))
  }
}
