package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q256 contract — the statistical and algebraic claims the
  * algorithm-replay oracle can't check:
  *   (a) estimation quality on a PLANTED fixture (|A| = 1000,
  *       |B| = 1000, |A∩B| = 500, |A∪B| = 1500): every estimate lands
  *       within a ~3σ band of truth (k = 128 ⇒ σ ≈ 9% for
  *       cardinalities; intersection adds Jaccard binomial noise);
  *   (b) merge losslessness — the monoid property that makes KMV a
  *       shardable artifact: the k smallest of (sketch(A) ∪ sketch(B))
  *       equal the k smallest of A ∪ B computed from scratch, as SETS,
  *       bit-for-bit (no tolerance);
  *   (c) intersection sanity: n_inter can never exceed either side's
  *       sketch size, and the union estimate is never below the larger
  *       single-side estimate by more than noise allows.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(items: Seq[String]) = {
    import spark.implicits._
    items.toDF("text")
  }

  private val setA = (0 until 1000).map(i => s"item_$i")
  private val setB = (500 until 1500).map(i => s"item_$i")

  test("q256: planted-overlap estimates land in band") {
    val r = queries.Sketches.kmvEstimate(df(setA), df(setB)).head()
    val estA = r.getAs[Double]("est_a")
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_intersection")
    assert(math.abs(estA - 1000.0) < 300.0, s"est_a=$estA far from 1000")
    assert(math.abs(estU - 1500.0) < 450.0, s"est_union=$estU far from 1500")
    assert(math.abs(estI - 500.0) < 250.0, s"est_intersection=$estI far from 500")
  }

  test("q256: two-level sketch merge equals the from-scratch sketch exactly") {
    val h = expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
    val k = queries.Sketches.KmvK
    def sketchOf(items: Seq[String]): Seq[Long] =
      df(items).select(h.as("h")).distinct().orderBy("h").limit(k)
        .collect().map(_.getLong(0)).toSeq
    val skA = sketchOf(setA)
    val skB = sketchOf(setB)
    // merge the two sketches (no access to the raw sets)
    val merged = (skA ++ skB).distinct.sorted.take(k)
    // sketch of the full union, from scratch
    val direct = sketchOf((setA ++ setB).distinct)
    assert(merged === direct,
      "two-level KMV merge diverged from the single-level sketch")
  }

  test("q256: structural sanity of the sketch counts") {
    val r = queries.Sketches.kmvEstimate(df(setA), df(setB)).head()
    val kU = r.getAs[Long]("k_u")
    val nInter = r.getAs[Long]("n_inter")
    assert(kU === queries.Sketches.KmvK.toLong)
    assert(nInter > 0 && nInter < kU,
      s"planted overlap must be partially represented: n_inter=$nInter of $kU")
    val estU = r.getAs[Double]("est_union")
    val estA = r.getAs[Double]("est_a")
    val estB = r.getAs[Double]("est_b")
    assert(estU >= math.max(estA, estB) * 0.8,
      "union estimate collapsed below its sides")
  }
}
