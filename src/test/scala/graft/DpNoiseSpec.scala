package graft

import org.scalatest.funsuite.AnyFunSuite

/** q315 DP-mechanism differential: replay the seeded 60-bit uniform and
  * the inverse-CDF Laplace transform in plain Scala (MessageDigest +
  * math.log) and require bit-exact agreement; pin the mechanism's
  * contract — noise magnitude bounded by the 60-bit draw's resolution
  * (|x| ≤ ln(2⁶⁰)/ε), the release is exactly count + noise, and the
  * draw really varies across release keys.
  */
class DpNoiseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q315 matches a plain-Scala Laplace replay; noise bounded and keyed") {
    val counts = Tables.events(spark, d).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val md = java.security.MessageDigest.getInstance("MD5")
    def noiseOf(tpe: String): Double = {
      md.reset()
      val hex = md.digest(s"dp|$tpe".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val u = (h.toDouble + 0.5) / 1152921504606846976L.toDouble
      val sgn = if (u >= 0.5) 1.0 else -1.0
      math.floor(-sgn * math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e6 + 0.5) / 1e6
    }

    val out = SparkEntry.queries("q315_dp_noised_counts")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == counts.size)
    out.foreach { case (tpe, n, eps, noise, noised) =>
      assert(n == counts(tpe) && eps == 1.0)
      assert(noise == noiseOf(tpe), s"$tpe: noise replay mismatch")
      assert(noised == n.toDouble + noise, s"$tpe: release != count + noise")
      // 60-bit draw resolution bounds the tail: |x| ≤ ln(2^60)/ε ≈ 41.59
      assert(math.abs(noise) <= 42.0, s"$tpe: noise $noise outside the draw's support")
    }
    // the draws are keyed by release, not constant
    assert(out.map(_._4).distinct.length > 1, "all releases drew identical noise")
  }
}
