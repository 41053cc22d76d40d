package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q255 contract — the distributed matrix-monoid scan:
  *   (a) exactness: the 8-partition two-phase scan equals the
  *       1-partition run bit-for-bit (integers — no tolerance), which
  *       itself equals an independent driver-side sequential replay of
  *       the recurrence;
  *   (b) the algebra the scan rests on: composing two transition
  *       matrices equals stepping twice, and mulMod is associative on
  *       probe matrices (without associativity the partition split
  *       would change the answer);
  *   (c) partition-count invariance over a spread of counts (the
  *       production knob a 1000-partition deployment turns).
  */
class MatrixScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def collectScan(parts: Int): Map[(String, java.sql.Timestamp), (Long, Long)] =
    MatrixScan.fingerprintScan(spark, d, parts)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap

  test("q255: multi-partition scan equals single-partition and a sequential replay") {
    val multi = collectScan(8)
    val single = collectScan(1)
    assert(multi === single, "partition split changed the recurrence answer")

    // independent sequential replay from the same daily inputs
    val rows = multi.toSeq
      .map { case ((k, day), (x, fp)) => (k, day, x, fp) }
      .sortBy(t => (t._1, t._2.getTime))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (_, seq) =>
      var h = 0L
      var hp = 0L
      seq.foreach { case (k, day, x, fp) =>
        val nh = (MatrixScan.A1 * h + MatrixScan.A2 * hp + x) % MatrixScan.P
        hp = h
        h = nh
        assert(fp === h, s"scan diverged from sequential replay at ($k, $day)")
      }
    }
    assert(rows.nonEmpty && byKey.size >= 2, "fixture drift: too few series")
  }

  test("q255: transition composition equals two steps; mulMod is associative") {
    val xs = Seq(17L, 998244353L, 0L, MatrixScan.P - 1)
    for (x1 <- xs; x2 <- xs) {
      // step twice from (h, hp) = (5, 3)
      val h1 = (MatrixScan.A1 * 5L + MatrixScan.A2 * 3L + x1 % MatrixScan.P) % MatrixScan.P
      val h2 = (MatrixScan.A1 * h1 + MatrixScan.A2 * 5L + x2 % MatrixScan.P) % MatrixScan.P
      // same via the composed matrix applied to (5, 3, 1)
      val m = MatrixScan.mulMod(MatrixScan.tMat(x2), MatrixScan.tMat(x1))
      val hm = (m(0) * 5L % MatrixScan.P + m(1) * 3L % MatrixScan.P + m(2)) % MatrixScan.P
      val hpm = (m(3) * 5L % MatrixScan.P + m(4) * 3L % MatrixScan.P + m(5)) % MatrixScan.P
      assert(hm === h2 && hpm === h1,
        s"matrix composition diverged from stepping at x1=$x1 x2=$x2")
    }
    // associativity on the same probes
    for (x1 <- xs; x2 <- xs; x3 <- xs) {
      val a = MatrixScan.tMat(x1); val b = MatrixScan.tMat(x2); val c = MatrixScan.tMat(x3)
      assert(MatrixScan.mulMod(MatrixScan.mulMod(a, b), c).toSeq ===
        MatrixScan.mulMod(a, MatrixScan.mulMod(b, c)).toSeq,
        s"mulMod not associative at ($x1, $x2, $x3)")
    }
  }

  test("q255: partition-count invariance across a spread of counts") {
    val base = collectScan(8)
    for (parts <- Seq(2, 5, 32)) {
      assert(collectScan(parts) === base, s"answer changed at parts=$parts")
    }
  }
}
