package graft

import org.scalatest.funsuite.AnyFunSuite

/** q300 incremental-view-maintenance contract beyond the oracle (which
  * already pins increment-then-merge ≡ rebuild): the repair must be
  * INCREMENTAL in fact, not just in name — the delta is a strict,
  * non-empty subset; untouched store rows pass through byte-identical;
  * and dirty rows differ from the base by exactly the delta's
  * contribution.
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q300: delta is non-empty and strictly smaller than the corpus") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, d)
    val total = ev.count()
    val late = ev.where(col("event_id") % 17 === 0).count()
    assert(late > 0, "fixture plants no late rows — the repair path is untested")
    assert(late < total / 4, s"delta ($late of $total) is not delta-sized")
  }

  test("q300: untouched rows byte-identical to base; dirty rows = base + delta") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q300_incremental_rollup")(spark, d).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    val base = ev.filterNot(_._3 % 17 == 0)
      .groupBy(t => (t._1, t._2)).view
      .mapValues(xs => (xs.map(_._4).sum, xs.length.toLong)).toMap
    val delta = ev.filter(_._3 % 17 == 0)
      .groupBy(t => (t._1, t._2)).view
      .mapValues(xs => (xs.map(_._4).sum, xs.length.toLong)).toMap
    assert(out.keySet == (base.keySet ++ delta.keySet))
    out.foreach { case (k, (cs, n)) =>
      val (bc, bn) = base.getOrElse(k, (0L, 0L))
      val (dc, dn) = delta.getOrElse(k, (0L, 0L))
      assert(cs == bc + dc && n == bn + dn, s"$k repaired wrong")
      if (!delta.contains(k))
        assert((cs, n) == ((bc, bn)), s"$k: untouched row modified")
    }
  }
}
