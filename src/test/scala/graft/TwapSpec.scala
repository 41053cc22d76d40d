package graft

import org.scalatest.funsuite.AnyFunSuite

/** q304 daily TWAP: independent sequential replay of the step-function
  * integral in plain Scala (sort each (type, day)'s events, weight
  * each cent value by micros until the next observation or midnight,
  * divide the exact integer sums) — the distributed window/rollup must
  * agree on every field. Also pins the bursty-sampling property TWAP
  * exists for: a burst of equal values in one minute moves the
  * row-mean toward itself but leaves the time-weighted mean at the
  * value that actually held the day (checked on the replay arithmetic
  * by duration-mass conservation: durations per day sum to exactly
  * midnight minus first observation).
  */
class TwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q304 equals a sequential step-integral replay; duration mass conserved") {
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val dayUs = 86_400_000_000L
    val expected = rows.groupBy(t => (t._1, t._2)).map { case ((tpe, day), es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      val midnight = (sorted.head._3 / dayUs + 1) * dayUs
      var num = BigInt(0); var den = 0L
      sorted.indices.foreach { i =>
        val end = if (i + 1 < sorted.length) sorted(i + 1)._3 else midnight
        val dur = end - sorted(i)._3
        num += BigInt(sorted(i)._5) * dur
        den += dur
      }
      assert(den == midnight - sorted.head._3,
        s"($tpe,$day): duration mass must span first observation to midnight")
      (tpe, day) -> ((sorted.length.toLong, den,
        num.toDouble / den.toDouble))
    }
    val got = SparkEntry.queries("q304_daily_twap")(spark, d).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected, s"TWAP replay diverged (sizes ${got.size}/${expected.size})")
  }
}
