package graft

import org.scalatest.funsuite.AnyFunSuite

/** q355 — ANN recall audit: the properties that make the audit table
  * trustworthy as a serving-config instrument. Recall must be monotone
  * non-decreasing in nprobe (probing more cells can only add
  * candidates), the nprobe = IvfCentroids row must be the definitional
  * brute-force identity (hits = ivf_n = k — probing every cell IS the
  * exact scan), the curve must be nontrivial at the bottom (nprobe = 1
  * misses something, or the audit measures nothing), and the spine must
  * be complete (every settings × probe cell present exactly once, even
  * where a probe returned nothing).
  */
class RecallAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val rows: Array[(Long, Long, Long, Long)] =
    SparkEntry.queries("q355_ann_recall_audit")(spark, d)
      .select("nprobe", "probe_id", "ivf_n", "hits")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("the spine is complete: {1,2,4,8} x 8 probes, exactly once each") {
    assert(rows.length == 32)
    assert(rows.map(r => (r._1, r._2)).toSet ==
      (for { np <- Set(1L, 2L, 4L, 8L); p <- 0L until 8L } yield (np, p)))
  }

  test("hits <= ivf_n <= 5 everywhere") {
    for ((np, p, n, h) <- rows)
      assert(h <= n && n <= 5L, s"bounds broken at nprobe=$np probe=$p: ivf_n=$n hits=$h")
  }

  test("recall and result count are monotone non-decreasing in nprobe") {
    for ((p, perProbe) <- rows.groupBy(_._2)) {
      val byNp = perProbe.sortBy(_._1).toSeq
      for (Seq(a, b) <- byNp.sliding(2)) {
        assert(a._3 <= b._3, s"probe $p: ivf_n drops ${a._1}->${b._1}")
        assert(a._4 <= b._4, s"probe $p: hits drop ${a._1}->${b._1}")
      }
    }
  }

  test("nprobe = 8 is the brute-force identity: hits = ivf_n = 5 for every probe") {
    for ((np, p, n, h) <- rows if np == 8L)
      assert(n == 5L && h == 5L, s"probe $p at full probe: ivf_n=$n hits=$h")
  }

  test("the curve is nontrivial: nprobe = 1 misses at least one true neighbor somewhere") {
    assert(rows.exists(r => r._1 == 1L && r._4 < 5L),
      "nprobe=1 already has perfect recall on every probe — the audit measures nothing here")
  }
}
