package graft

import org.scalatest.funsuite.AnyFunSuite

/** q292 frequency-sketch store + q295 rolling bitmap distinct — the two
  * round-11 store queries, each replayed in plain Scala from the raw
  * events (no Spark aggregates, no SQL) and required to match exactly:
  * below eviction capacity the frequent-items store is a counting map
  * (q292's exactness theorem), and bitmaps are exact by construction
  * (q295), so both replays are equality checks, not bands.
  */
class TopKStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val evs: Array[(java.time.LocalDate, Long)] =
    Tables.events(spark, d).select("ts", "user_id").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate,
        r.getAs[Long]("user_id")))

  test("q292: every range's top-16 equals the exact per-range counts") {
    val lo = evs.map(_._1).min
    val hi = evs.map(_._1).max
    val ranges = Seq(("day1", lo, lo), ("week1", lo, lo.plusDays(6)), ("all", lo, hi))
    val expected = ranges.flatMap { case (tag, a, b) =>
      evs.filter { case (day, _) => !day.isBefore(a) && !day.isAfter(b) }
        .groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (u, c) => (-c, u) }.take(16)
        .map { case (u, c) => (tag, u, c) }
    }.toSet
    val out = SparkEntry.queries("q292_topk_sketch_store")(spark, d)
      .collect()
      .map(r => (r.getAs[String]("range_tag"), r.getAs[Long]("user_id"),
        r.getAs[Long]("cnt"))).toSet
    assert(out == expected, s"sketch store drifted from exact counts")
  }

  test("q295: per-day trailing-7 distinct equals the exact replay") {
    val byDay = evs.groupBy(_._1)
    val expected = byDay.keySet.map { anchor =>
      val window = byDay.filter { case (day, _) =>
        !day.isBefore(anchor.minusDays(6)) && !day.isAfter(anchor)
      }
      (anchor.toString, window.keySet.size.toLong,
        window.values.flatten.map(_._2).toSet.size.toLong)
    }
    val out = SparkEntry.queries("q295_rolling_distinct")(spark, d)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toString,
        r.getAs[Long]("n_days_in_window"), r.getAs[Long]("wau"))).toSet
    assert(out == expected, "rolling bitmap WAU drifted from exact replay")
  }
}
