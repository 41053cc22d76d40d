package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** q163 SCD2 contract, via sequential replay of each user's stream plus
  * the interval algebra a consumer relies on: per user the intervals
  * are CONTIGUOUS (next valid_from == previous valid_to), non-empty,
  * attribute-alternating (no two consecutive intervals share the
  * attribute — otherwise the collapse failed), exactly ONE current
  * interval per user, and the first interval starts at the user's first
  * event.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val Sentinel = Timestamp.valueOf("2262-01-01 00:00:00")

  test("q163 matches a sequential replay and keeps interval algebra") {
    val evs = Tables.events(spark, d)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Timestamp]("ts"), r.getAs[Long]("event_id")))

    val expected = evs.toSeq.groupBy(_._1).flatMap { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._4))
      val changes = ordered.foldLeft(Vector.empty[(String, Timestamp)]) {
        case (acc, (_, attr, ts, _)) =>
          if (acc.nonEmpty && acc.last._1 == attr) acc else acc :+ ((attr, ts))
      }
      changes.zipWithIndex.map { case ((attr, from), i) =>
        val to = if (i + 1 < changes.length) changes(i + 1)._2 else Sentinel
        (user, attr, from) -> ((to, if (to == Sentinel) 1L else 0L))
      }
    }

    val got = SparkEntry.queries("q163_scd2_history")(spark, d).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("attr"),
        r.getAs[Timestamp]("valid_from")) ->
        ((r.getAs[Timestamp]("valid_to"), r.getAs[Long]("is_current"))))

    assert(got.toMap == expected.toMap)
    assert(got.length == expected.size, "duplicate (user, attr, from) keys")

    val byUser = got.groupBy(_._1._1)
    byUser.foreach { case (user, ivs) =>
      val ordered = ivs.sortBy(_._1._3.getTime)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._2._1 == b._1._3, s"user $user intervals not contiguous")
          assert(a._1._2 != b._1._2, s"user $user consecutive attrs equal")
        case _ =>
      }
      assert(ivs.count(_._2._2 == 1L) == 1, s"user $user current-count != 1")
      ordered.foreach(iv => assert(iv._1._3.before(iv._2._1), s"empty interval"))
    }
  }
}
