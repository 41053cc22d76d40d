package graft

import org.scalatest.funsuite.AnyFunSuite

/** q308 bitemporal restatement: independent sequential replay (per
  * as-of batch, each event's latest version with batch ≤ B, rolled up
  * per (type, day)) plus the axis identities that make it bitemporal:
  * batch-0 beliefs equal the uncorrected rollup exactly; restated
  * cent mass between consecutive as-of points equals the planted
  * correction deltas exactly (batch 1 adds 100 per event_id % 5 row,
  * batch 2 adds a FURTHER delta replacing +100 with +200 on %35
  * rows); n_events is as-of-invariant (corrections restate, never
  * add rows).
  */
class BitemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q308 equals a sequential latest-version replay; restated mass exact") {
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    def believed(b: Long)(e: (String, String, Long, Long)): (Long, Long) = {
      val (_, _, id, c) = e
      if (b >= 2 && id % 7 == 0) (2L, c + 200)
      else if (b >= 1 && id % 5 == 0) (1L, c + 100)
      else (0L, c)
    }
    val expected = (for {
      b <- 0L to 2L
      e <- base
    } yield {
      val (vb, vc) = believed(b)(e)
      ((b, e._1, e._2), (vc, if (vb >= 1) 1L else 0L))
    }).groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum)
    }.toMap
    val got = SparkEntry.queries("q308_bitemporal_asof")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"bitemporal replay diverged (${got.size}/${expected.size})")

    // axis identities
    val byB = got.groupBy(_._1._1)
    assert(byB.keySet == Set(0L, 1L, 2L))
    (0L to 2L).foreach { b =>
      assert(byB(b).values.map(_._1).sum == base.length.toLong,
        s"as-of $b: corrections must restate, never add rows")
    }
    val mass = (0L to 2L).map(b => byB(b).values.map(_._2).sum)
    val d01 = base.count(_._3 % 5 == 0) * 100L
    val d12 = base.count(_._3 % 7 == 0) * 200L -
      base.count(e => e._3 % 35 == 0) * 100L
    assert(mass(1) - mass(0) == d01, "batch-1 restated mass drifted")
    assert(mass(2) - mass(1) == d12, "batch-2 restated mass drifted")
  }
}
