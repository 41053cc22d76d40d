package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q258 contract beyond the (already-exact) oracle: the bitmap artifact
  * is a true MONOID — merging pre-merged halves equals merging all the
  * day rows flat, so a store can be compacted/rolled up level by level
  * without ever touching raw events (the property that makes it an
  * artifact rather than a cache).
  */
class BitmapStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q258: two-level OR-merge equals flat merge exactly") {
    val daily = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"), expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .cache()
    try {
      val mid = daily.agg(min("day"), max("day")).head()
      val cut = mid.getDate(0).toLocalDate
        .plusDays(java.time.temporal.ChronoUnit.DAYS.between(
          mid.getDate(0).toLocalDate, mid.getDate(1).toLocalDate) / 2)
      def mergeOf(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("bucket").agg(expr("bitmap_or_agg(bm)").as("m"))
      // two-level: pre-merge each half, then merge the halves
      val lo = mergeOf(daily.where(col("day") <= lit(cut.toString)))
        .withColumnRenamed("m", "bm")
      val hi = mergeOf(daily.where(col("day") > lit(cut.toString)))
        .withColumnRenamed("m", "bm")
      val twoLevel = mergeOf(lo.unionAll(hi))
        .agg(sum(expr("bitmap_count(m)"))).head().getLong(0)
      // flat: merge every day row directly
      val flat = mergeOf(daily)
        .agg(sum(expr("bitmap_count(m)"))).head().getLong(0)
      val exact = Tables.events(spark, d)
        .agg(countDistinct(col("user_id"))).head().getLong(0)
      assert(twoLevel === flat, "two-level bitmap merge diverged from flat merge")
      assert(flat === exact, "bitmap distinct diverged from exact COUNT(DISTINCT)")
      assert(exact > 0)
    } finally {
      daily.unpersist()
      ()
    }
  }
}
