package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q354 — SQ8 MIPS search tier: plain-Scala replay of the whole chain
  * (q81 record → integer-dot candidate cut → exact float rerank) plus
  * the properties that make the tier trustworthy: the candidate cut is
  * exactly the ascore top-20, the exact rerank is load-bearing (it
  * actually reorders a probe), symmetric max-abs quantization attains
  * |code| = 127 in the extreme dimension, and — the serving claim — the
  * 20-candidate cut absorbs ALL quantization error at this scale
  * (recall@5 vs brute-force exact MIPS is 5/5 on every probe).
  */
class Sq8MipsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val out: Array[(Long, Long, Double, Double, Long)] =
    SparkEntry.queries("q354_ann_sq8_mips")(spark, d)
      .select("probe_id", "neighbor_id", "approx_dot", "dot", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  /** q81's cleaned scale: max-abs fold, degraded to 0 for zero/NaN/Inf. */
  private def scaleOf(v: Array[Double]): Double = {
    val m = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))
    if (m == 0.0 || m.isNaN || m.isInfinity) 0.0 else m
  }

  /** q81's int8 code, as the double the engine folds over. */
  private def codes(v: Array[Double], scale: Double): Array[Double] =
    v.map(x => math.max(-127L, math.min(127L,
      math.floor(x * 127.0 / scale + 0.5).toLong)).toDouble)

  private lazy val eligible: Map[Long, (Double, Array[Double])] =
    vecs.collect { case (id, v) if scaleOf(v) > 0.0 =>
      id -> (scaleOf(v), codes(v, scaleOf(v)))
    }

  private def fold(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def ascore(p: Long, x: Long): Double = {
    val (sq, pq) = eligible(p); val (sx, xq) = eligible(x)
    fold(pq, xq) * sq * sx / 16129.0
  }

  test("every output score replays bit-exactly in plain Scala") {
    assert(out.nonEmpty)
    for ((p, x, ad, dt, _) <- out) {
      assert(ascore(p, x) == ad, s"approx_dot drifts for ($p,$x)")
      assert(fold(vecs(p), vecs(x)) == dt, s"exact dot drifts for ($p,$x)")
    }
  }

  test("output neighbors come from the ascore top-20 candidate cut") {
    for (p <- out.map(_._1).distinct) {
      val cut = eligible.keys.filter(_ != p).toSeq
        .map(x => (x, ascore(p, x)))
        .sortBy { case (x, a) => (-a, x) }
        .take(20).map(_._1).toSet
      for ((_, x, _, _, _) <- out.filter(_._1 == p))
        assert(cut(x), s"neighbor $x of probe $p outside the top-20 candidates")
    }
  }

  test("the exact rerank is load-bearing: some probe's approx order is reordered") {
    val reordered = out.groupBy(_._1).values.exists { rows =>
      val byRank = rows.sortBy(_._5).map(_._3).toSeq
      byRank != byRank.sortBy(-_)
    }
    assert(reordered, "exact rerank never reorders — the rerank stage is vacuous here")
  }

  test("rnk is the (dot desc, neighbor_id) total order and k=5 per probe") {
    for ((p, rows) <- out.groupBy(_._1)) {
      val sorted = rows.sortBy(_._5).toSeq
      assert(sorted.map(_._5) == (1L to sorted.length), s"rank gap for probe $p")
      assert(sorted.length <= 5)
      assert(sorted == rows.sortBy(r => (-r._4, r._2)).toSeq.take(sorted.length),
        s"probe $p not ordered by (dot desc, id)")
    }
  }

  test("symmetric max-abs quantization attains |code| = 127 in the extreme dimension") {
    for ((id, (_, q)) <- eligible.take(50))
      assert(q.map(math.abs).max == 127.0, s"vector $id never reaches the code extreme")
  }

  test("scale-0 (zero or non-finite) vectors never surface as neighbors") {
    for ((_, x, _, _, _) <- out) assert(eligible.contains(x), s"ineligible neighbor $x")
  }

  test("the 20-candidate cut absorbs quantization error: recall@5 vs exact MIPS is 5/5") {
    for (p <- out.map(_._1).distinct) {
      val brute = eligible.keys.filter(_ != p).toSeq
        .map(x => (x, fold(vecs(p), vecs(x))))
        .sortBy { case (x, dt) => (-dt, x) }
        .take(5).map(_._1).toSet
      val got = out.filter(_._1 == p).map(_._2).toSet
      assert(got == brute, s"probe $p: SQ8 top-5 $got != exact MIPS top-5 $brute")
    }
  }
}
