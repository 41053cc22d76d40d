package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q356 — LSH S-curve audit. On the real corpus the fixture's pairs sit
  * at the curve's extremes (near-dup copies at J ≥ 0.8, shared-boilerplate
  * noise at J < 0.1), so the audit's bucket math, theory column, and
  * completeness are pinned there, and the PROBABILISTIC MIDDLE of the
  * curve — the whole reason a (bands × rows) design is a choice — is
  * pinned on a crafted corpus whose pairs land at known Jaccard in
  * bucket 3, where detection must be strictly partial and near theory.
  */
class ScurveAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def rowsOf(dir: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("q356_lsh_scurve_audit")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  private lazy val real = rowsOf(d)

  test("the spine is total: buckets 0..10 exactly once, counts bounded") {
    assert(real.keySet == (0L to 10L).toSet)
    for ((b, (n, det, _)) <- real)
      assert(det <= n, s"bucket $b detects more than exists: $det > $n")
  }

  test("theory_mid replays bit-exactly in plain Scala") {
    for ((b, (_, _, th)) <- real) {
      val m = math.min((b.toDouble + 0.5) / 10.0, 1.0)
      val u = 1.0 - m * m
      val t = (u * u) * u
      assert(1.0 - t * t == th, s"theory drifts at bucket $b")
    }
  }

  test("high-J buckets are fully detected; the noise floor stays under theory") {
    val high = (8L to 10L).map(b => real(b)).filter(_._1 > 0)
    assert(high.nonEmpty, "no high-J pairs at sf0.001 — fixture drift")
    for ((n, det, _) <- high) assert(det == n, "a near-dup escaped the bands")
    val (n0, det0, th0) = real(0L)
    assert(n0 > 0, "no low-J background pairs at sf0.001")
    assert(det0.toDouble / n0 <= th0,
      s"bucket-0 false-candidate rate ${det0.toDouble / n0} above the midpoint theory $th0")
  }

  /** Crafted corpus: 40 pairs in their own token namespaces, each with
    * 30-token docs sharing a 17-token prefix — 28 grams a side, 15
    * shared, J = 15/41 ≈ 0.366, bucket (10·15) div 41 = 3 — plus one
    * identical pair (J = 1, bucket 10). Namespaces are disjoint, so no
    * cross-pair grams exist and the ground truth is exactly 41 pairs.
    */
  private lazy val craftedDir: String = {
    import spark.implicits._
    val pairs = (0 until 40).flatMap { k =>
      val shared = (1 to 17).map(i => s"p${k}t$i")
      val restA = (18 to 30).map(i => s"p${k}a$i")
      val restB = (18 to 30).map(i => s"p${k}b$i")
      Seq((2L * k, (shared ++ restA).mkString(" ")),
        (2L * k + 1, (shared ++ restB).mkString(" ")))
    }
    val same = (1 to 30).map(i => s"samet$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_q356_spec").toString
    (pairs ++ Seq((1000L, same), (1001L, same)))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("crafted middle of the curve: bucket 3 detection is strictly partial and near theory") {
    val crafted = rowsOf(craftedDir)
    val (n1, det1, _) = crafted(10L)
    assert(n1 == 1 && det1 == 1, "the identical pair must be pigeonhole-detected")
    val (n3, det3, th3) = crafted(3L)
    assert(n3 == 40L, s"expected the 40 crafted pairs in bucket 3, got $n3")
    assert(det3 > 0 && det3 < n3,
      s"bucket-3 detection $det3/$n3 is not partial — the probabilistic middle is dead")
    val rate = det3.toDouble / n3
    assert(math.abs(rate - th3) < 0.3,
      s"bucket-3 empirical rate $rate far from theory $th3")
    assert((0L to 10L).filterNot(b => b == 3L || b == 10L)
      .forall(b => crafted(b)._1 == 0L),
      "crafted ground truth leaked outside buckets 3 and 10")
  }
}
