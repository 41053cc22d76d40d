package graft

import org.scalatest.funsuite.AnyFunSuite

/** q298 Neyman allocation + q299 length-bucket audit, replayed in plain
  * Scala (exact integer moments, quantized weights, integer-division
  * quotas / pure integer padding accounting) and checked for the
  * statistics' defining properties.
  */
class AllocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q298 matches the exact-integer replay; budget and monotonicity hold") {
    val docs = Tables.documents(spark, d)
      .select("lang", "source", "n_chars").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val strata = docs.groupBy(_._1).map { case (k, xs) =>
      val v = xs.map(_._2)
      val nh = v.length.toLong
      val s1 = v.sum
      val s2 = v.map(x => x * x).sum
      val mean = s1.toDouble / nh.toDouble
      val sigma = math.sqrt(
        math.max(s2.toDouble / nh.toDouble - mean * mean, 0.0))
      val wq = math.floor(nh.toDouble * sigma * 1e6 + 0.5).toLong
      k -> ((nh, mean, sigma, wq))
    }
    val sw = strata.values.map(_._4).sum
    val expected = strata.map { case (k, (nh, mean, sigma, wq)) =>
      k -> ((nh, mean, sigma, if (sw > 0) 1000L * wq / sw else 0L))
    }
    val out = SparkEntry.queries("q298_neyman_allocation")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    assert(out == expected)
    // floor quotas can only undershoot the budget
    val total = out.values.map(_._4).sum
    assert(total <= 1000L, s"allocation exceeds budget: $total")
    // a zero-variance stratum gets zero labelers regardless of size
    out.foreach { case (k, (_, _, sigma, alloc)) =>
      if (sigma == 0.0) assert(alloc == 0L, s"$k: constant stratum allocated")
    }
  }

  test("q299 matches the integer replay; bucketing strictly beats naive padding") {
    val ns = Tables.documents(spark, d).select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    def bucketOf(n: Long): Long =
      Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
        .find(n <= _).getOrElse(8192L)
    val lmax = ns.max
    val naive = lmax * ns.length - ns.sum
    val expected = ns.groupBy(bucketOf).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.sum, b * xs.length - xs.sum, lmax, naive))
    }
    val out = SparkEntry.queries("q299_length_buckets")(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == expected)
    val bucketTotal = out.values.map(_._3).sum
    assert(bucketTotal < naive,
      s"bucketing ($bucketTotal) not below naive padding ($naive)")
  }
}
