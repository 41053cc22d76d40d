package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q257 contract — the claims the algorithm-replay oracle can't check:
  *   (a) differential replay: an independent JVM implementation (raw
  *       MessageDigest md5, BigInteger hex, plain doubles) selects the
  *       IDENTICAL top-k set with identical priorities — the engine
  *       expression chain introduces no drift;
  *   (b) weighted statistics: on a planted two-class fixture (500
  *       weight-10 items vs 500 weight-1 items, k = 100), heavy items
  *       dominate the sample across 30 seeds at roughly their
  *       probability-proportional share (expected ≈ 91%), and light
  *       items still appear somewhere (it's a weighting, not a filter);
  *   (c) without-replacement: the sample never repeats an id.
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  /** Independent replay of u and priority for one id. */
  private def replayPriority(seed: String, id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h = new java.math.BigInteger(hex.substring(0, 15), 16).longValueExact()
    val u = ((h % 1073741824L).toDouble + 0.5) / 1073741824.0
    w / u
  }

  test("q257: engine selection equals the independent JVM replay exactly") {
    val got = queries.Sampling.weightedSample.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === queries.Sampling.WsK)
    // replay every doc's priority and take the same top-k
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = docs
      .map { case (id, w) => (id, w, replayPriority("wsamp", id, w.toDouble)) }
      .sortBy { case (id, _, p) => (-p, id) }
      .take(queries.Sampling.WsK)
    assert(got.toSeq === want.toSeq,
      "engine-side priorities or ordering diverged from the JVM replay")
  }

  test("q257: heavy items take ~their probability-proportional share") {
    import spark.implicits._
    val fixture = ((0L until 500L).map(i => (i, 10L)) ++
      (500L until 1000L).map(i => (i, 1L))).toDF("doc_id", "w")
    val k = 100
    var heavyTotal = 0L
    var lightSeen = 0L
    for (seed <- 1 to 30) {
      val top = queries.Sampling.prioritized(fixture, s"ws_spec_$seed")
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(k)
        .select("doc_id").collect().map(_.getLong(0))
      assert(top.distinct.length === k, "sample repeated an id")
      val heavy = top.count(_ < 500L)
      heavyTotal += heavy
      lightSeen += (k - heavy)
    }
    val heavyFrac = heavyTotal.toDouble / (30.0 * k)
    // heavy items hold 10/11 ≈ 91% of the total weight; priority
    // sampling tracks probability-proportional-to-size closely at
    // k = 100 of 1000 — band is ±3σ-ish of the planted share
    assert(heavyFrac > 0.80 && heavyFrac < 0.99,
      s"heavy-item share $heavyFrac outside the weighted band")
    assert(lightSeen > 0L, "light items never sampled — weighting became a filter")
  }
}
