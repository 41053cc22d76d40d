package graft

import org.scalatest.funsuite.AnyFunSuite

/** q310 minhash-estimator differential: recompute the 12-slot
  * signatures in plain Scala (md5 hash + LCG mixes over distinct
  * trigrams) for every audited pair and require the query's agreement
  * counts, estimates, and band booleans to match exactly; pin the
  * audit's reason to exist — the estimate is a k/12 grid value, the
  * band is the binomial 3σ width, and the fixture's verified pairs
  * overwhelmingly sit inside it.
  */
class EstimatorAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001
  private val P = 2147483647L
  private val K = 12

  test("q310 matches a plain-Scala signature replay; estimates on the k/12 grid") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(grams: Set[String]): Array[Long] = {
      val hs = grams.toArray.map { g =>
        md.reset()
        val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16) % P
      }
      Array.tabulate(K) { i =>
        val a = (2654435761L * (2L * i + 1)) % P
        val b = (40503L * (i + 1)) % P
        hs.map(h => (a * h + b) % P).min
      }
    }
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def gramsOf(id: Long): Set[String] = {
      val ws = docs(id).split(" ", -1)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }

    val out = SparkEntry.queries("q310_minhash_estimator_audit")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val j = r.getDouble(2)
      val nAgree = r.getLong(3)
      val (sa, sb) = (sig(gramsOf(a)), sig(gramsOf(b)))
      val agree = (0 until K).count(i => sa(i) == sb(i)).toLong
      assert(nAgree == agree, s"($a,$b): agreement replay mismatch")
      assert(r.getDouble(4) == nAgree.toDouble / K, s"($a,$b): estimate off the k/$K grid")
      val band = 3.0 * math.sqrt(j * (1.0 - j) / K) + 1.0 / K
      assert(r.getBoolean(6) == (r.getDouble(5) <= band), s"($a,$b): band boolean wrong")
    }
    // the estimator is healthy on this fixture: most verified pairs in-band
    val inBand = out.count(_.getBoolean(6))
    assert(inBand.toDouble / out.length >= 0.8,
      s"only $inBand/${out.length} pairs within the 3σ band — estimator drift")
  }
}
