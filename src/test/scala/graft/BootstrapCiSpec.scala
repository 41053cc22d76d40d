package graft

import org.scalatest.funsuite.AnyFunSuite

/** q152 bootstrap-CI differential: replay the deterministic Poisson
  * weights (md5 thresholds), the decimal replicate means, and the
  * rank-selected bounds in plain Scala (MessageDigest + BigDecimal — no
  * Spark, no SQL) and require bit-exact agreement; pin the statistical
  * sanity properties on this fixture (lo ≤ hi, the full-sample mean falls
  * inside its own interval, resample weight mass ≈ N per replicate).
  */
class BootstrapCiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val B = 32

  test("q152 matches a plain-Scala bootstrap replay bit-for-bit") {
    val evs = Tables.events(spark, d)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[Long]("event_id")))

    // pair scheme (round-11 verdict task 3): replicates 2p and 2p+1
    // share md5("p|id") — b even reads hex chars 1-15, b odd chars
    // 17-31 (the digest's two independent 60-bit halves)
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(b: Int, id: Long): Long = {
      md.reset()
      val hex = md.digest(s"${b / 2}|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val off = 16 * (b % 2)
      val h = java.lang.Long.parseLong(hex.slice(off, off + 15), 16) % 1000
      if (h < 368) 0L else if (h < 736) 1L else if (h < 920) 2L
      else if (h < 981) 3L else 4L
    }

    def dmean(vs: Seq[(Double, Long)]): Double = {
      val wsum = vs.map(_._2).sum
      if (wsum == 0L) 0.0 // empty resample: pinned on both engines
      else {
        val num = vs.map { case (v, w) =>
          BigDecimal(v * w).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
        num / wsum.toDouble
      }
    }

    val expected = evs.groupBy(_._1).map { case (tpe, rows) =>
      val means = (0 until B).map { b =>
        dmean(rows.map(r => (r._2, weight(b, r._3))))
      }.sorted
      val full = rows.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / rows.length
      tpe -> ((full, means(1), means(B - 2)))
    }

    val out = SparkEntry.queries("q152_bootstrap_ci")(spark, d).collect().map { r =>
      r.getAs[String]("event_type") ->
        ((r.getAs[Double]("mean_value"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))
    }.toMap
    assert(out == expected)

    out.foreach { case (tpe, (mean, lo, hi)) =>
      assert(lo <= hi, s"$tpe: inverted interval")
      assert(lo <= mean && mean <= hi, s"$tpe: mean outside its own CI")
      assert(hi - lo > 0, s"$tpe: degenerate interval")
    }
    // Poisson(1) mass: each replicate resamples ≈ N rows in expectation
    val masses = (0 until B).map(b => evs.map(r => weight(b, r._3)).sum.toDouble / evs.length)
    assert(masses.forall(m => m > 0.8 && m < 1.2), s"weight mass drifted: $masses")
  }
}
