package graft

import org.scalatest.funsuite.AnyFunSuite

/** q150 contract: the multi-batch streaming upsert loop converges to the
  * same per-user argmax a single-pass replay computes (batching
  * independence — the query itself already `require`s that more than one
  * micro-batch ran), with exactly one row per user.
  */
class StreamUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q150 converges to the direct per-user argmax") {
    val evs = Tables.events(spark, d)
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    implicit val tsOrd: Ordering[java.sql.Timestamp] = Ordering.comparatorToOrdering(
      java.util.Comparator.naturalOrder[java.sql.Timestamp]())
    val expected = evs.groupBy(_._2).view.mapValues { rows =>
      val (_, _, ts, tpe, v) = rows.maxBy(r => (r._3, r._1))
      (ts, tpe, v)
    }.toMap

    val out = SparkEntry.queries("q150_stream_upsert")(spark, d).collect().map { r =>
      r.getAs[Long]("user_id") ->
        ((r.getAs[java.sql.Timestamp]("last_ts"), r.getAs[String]("last_type"),
          r.getAs[Double]("last_value")))
    }.toMap
    assert(out == expected)
    assert(out.size == evs.map(_._2).distinct.length, "one row per user")
  }
}
