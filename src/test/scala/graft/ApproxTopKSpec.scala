package graft

import org.scalatest.funsuite.AnyFunSuite

/** q290 sketched heavy hitters (Spark's built-in `approx_top_k`) — the
  * sketch twin of q135's exact two-pass pipeline, pinned in BOTH
  * regimes:
  *   - BELOW CAPACITY (the registered query's regime at every test SF:
  *     vocabulary 31 ≪ capacity 1024): a frequent-items sketch is a
  *     plain counting map until it evicts, so q290 must equal q135's
  *     exact top-16 row-for-row — the theorem the full hash oracle
  *     rides on.
  *   - OVER CAPACITY (the 100 TB regime, forced with capacity 4 on a
  *     planted skewed stream): eviction makes counts estimates, but the
  *     dominant item must still surface and its estimate must stay
  *     within the sketch's one-sided error (estimate ≥ true count, and
  *     the overshoot is bounded by the evicted mass).
  */
class ApproxTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q290: below capacity the sketch equals the exact twin q135 row-for-row") {
    val exact = SparkEntry.queries("q135_heavy_hitters")(spark, d)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("cnt"))).toSeq
    val sketched = SparkEntry.queries("q290_approx_top_k")(spark, d)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("cnt"))).toSeq
    assert(sketched == exact, s"sketch drifted below capacity: $sketched vs $exact")
  }

  test("q290: over capacity the dominant item survives with bounded estimate") {
    import spark.implicits._
    // skewed stream: one dominant item (60%), a tail wide enough to
    // force eviction at maxItemsTracked = 4
    val stream = Seq.fill(600)("alpha") ++ (0 until 400).map(i => s"tail${i % 50}")
    val trueAlpha = 600L
    val evictedMass = 400L
    val out = stream.toDF("w")
      .agg(org.apache.spark.sql.functions.expr("approx_top_k(w, 2, 4)").as("tk"))
      .select(org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.col("tk")).as("e"))
      .select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.contains("alpha"), s"dominant item evicted: $out")
    val est = out("alpha")
    assert(est >= trueAlpha, s"frequent-items estimate $est under true count $trueAlpha")
    assert(est <= trueAlpha + evictedMass,
      s"estimate $est overshoots true count by more than the evicted mass")
  }
}
