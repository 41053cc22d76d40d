package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, count, lit}

/** q128 salted-join contract: (a) correctness-neutrality — the salted
  * result equals a plain unsalted join row-for-row, and (b) plan shape —
  * the join really is a shuffle join keyed by the salt (broadcast
  * disabled on the isolated session), because a silently-broadcast dim
  * would make the whole demonstration vacuous.
  */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q128: salted join ≡ unsalted join, and the plan shuffles on the salt") {
    val df = SparkEntry.queries("q128_salted_join")(spark, d)
    val salted = df.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("type_count"))).sortBy(_._1)

    val ev = Tables.events(spark, d).select(col("event_id"), col("event_type"))
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_count"))
    val plain = ev.join(dim, Seq("event_type"))
      .select("event_id", "event_type", "type_count").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("type_count"))).sortBy(_._1)

    assert(salted.sameElements(plain), "salting changed the join result")

    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      "dim side broadcast — the skew demonstration is vacuous")
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        && l.contains("salt")),
      s"no shuffle join keyed by salt in: ${p.take(3000)}")
  }
}
