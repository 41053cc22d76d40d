package graft

import org.scalatest.funsuite.AnyFunSuite

/** q164 perceptual-hash contract, independent of the DuckDB oracle:
  * recompute every group's membership from an in-test reimplementation
  * of the closed-form pixels + aHash (no Spark, no codec), then pin the
  * two properties the hash exists for — (1) INVARIANCE: all 5 brightness
  * variants of a pattern land in one group (every group spans the full
  * brightness range present for its pattern), and (2) SEPARATION: the 7
  * pattern classes never share a hash. Together they prove the 35
  * byte-distinct (pattern, brightness) classes collapse to exactly the
  * 7 perceptual groups — through a real PNG encode/decode round trip.
  */
class AhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def ahash(id: Long): String = {
    val c = (id % 7).toInt
    val delta = (id % 5).toInt * 8
    val bs = Array.ofDim[Long](8, 8)
    for (y <- 0 until 16; x <- 0 until 32) {
      val v = ((c + 3) * x * x + (2 * c + 5) * y * y + (c + 1) * x * y) % 200 + delta
      bs(y / 2)(x / 4) += v.toLong
    }
    val t = bs.map(_.sum).sum
    (for (by <- 0 until 8; bx <- 0 until 8)
      yield if (bs(by)(bx) * 64 > t) '1' else '0').mkString
  }

  test("q164: groups match replayed aHash; brightness collapses; patterns separate") {
    val rows = SparkEntry.queries("q164_ahash_dedup")(spark, d)
      .collect()
      .map(r => (r.getAs[String]("phash"), r.getAs[Long]("keeper_id"),
        r.getAs[Long]("n_images"), r.getAs[Long]("n_patterns"),
        r.getAs[Long]("n_brightness")))
    assert(rows.nonEmpty)

    val docIds = TestSpark.spark.read
      .parquet(s"$d/documents.parquet").select("doc_id")
      .collect().map(_.getLong(0))
    val expected = docIds.groupBy(ahash)
    assert(rows.length == expected.size, "group count != replayed aHash group count")
    rows.foreach { case (ph, keeper, n, nPat, nBright) =>
      val members = expected.getOrElse(ph, fail(s"unknown hash $ph"))
      assert(keeper == members.min, s"$ph keeper drift")
      assert(n == members.length.toLong, s"$ph size drift")
      // separation: one pattern class per perceptual group
      assert(nPat == 1L, s"$ph mixes $nPat pattern classes")
      assert(members.map(_ % 7).distinct.length == 1)
      // invariance: the group absorbs every brightness variant its
      // pattern has in the corpus
      assert(nBright == members.map(_ % 5).distinct.length.toLong)
      assert(nBright > 1L, s"$ph saw a single brightness — invariance untested")
    }
    // 7 quadratic patterns -> 7 perceptual groups at this corpus size
    assert(rows.length == 7)
  }
}
