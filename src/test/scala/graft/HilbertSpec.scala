package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, floor}

import graft.functions.{HilbertCalc, HilbertIndex, InterleaveBits}

/** q252 contract — the Hilbert clustering key and its pruned read:
  *   (a) the defining curve property: consecutive positions d, d+1 map to
  *       ADJACENT cells (Manhattan distance exactly 1) over the entire
  *       order-6 curve — the locality guarantee that makes a contiguous
  *       curve segment a tight rectangle;
  *   (b) the Morton counterexample: the seam jump the Hilbert curve fixes
  *       really exists on the Morton curve (consecutive z-values that are
  *       many cells apart), so (a) is not vacuous;
  *   (c) xy2d/d2xy are mutual inverses (bijection on the grid);
  *   (d) expression correctness: interpreted eval ≡ codegen eval ≡ the
  *       Scala kernel, via both the Column API and a forced interpreted
  *       projection;
  *   (e) file economics at read time: the Hilbert layout's envelope prune
  *       reads a strict subset of the files written, and the pruned scan
  *       equals the unpruned filter row-for-row.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("consecutive curve positions are adjacent cells (whole order-6 curve)") {
    // order-6 sub-curve = positions [0, 4096): at order 16 the first 2^12
    // positions traverse exactly the 64x64 corner sub-square, because the
    // Hilbert construction is self-similar (coarse bits first).
    var prev = HilbertCalc.d2xy(0L)
    var dd = 1L
    while (dd < 4096L) {
      val cur = HilbertCalc.d2xy(dd)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan === 1L, s"non-adjacent step at d=$dd: $prev -> $cur")
      prev = cur
      dd += 1
    }
  }

  test("the Morton curve takes seam jumps (the defect Hilbert fixes)") {
    // consecutive Morton codes 7 -> 8 jump from (1,3)=(x,y) to (2,0):
    // Manhattan distance 4 on the order-2 curve. Find the worst
    // consecutive-step distance on the same 64x64 grid for both curves.
    def mortonXY(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      var i = 0
      while (i < 16) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    def worstStep(xy: Long => (Long, Long)): Long =
      (1L until 4096L).map { dd =>
        val a = xy(dd - 1); val b = xy(dd)
        math.abs(b._1 - a._1) + math.abs(b._2 - a._2)
      }.max
    assert(worstStep(HilbertCalc.d2xy) === 1L)
    assert(worstStep(mortonXY) > 1L,
      "Morton curve showed no seam jump — grid too small or mapping wrong")
  }

  test("xy2d and d2xy are mutual inverses on the grid") {
    // full low-order grid plus scattered high-bit points
    for (x <- 0L until 32L; y <- 0L until 32L) {
      val dd = HilbertCalc.xy2d(x, y)
      assert(HilbertCalc.d2xy(dd) === ((x, y)), s"round trip failed at ($x,$y)")
    }
    val probes = Seq((65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    for ((x, y) <- probes) {
      val dd = HilbertCalc.xy2d(x, y)
      assert(HilbertCalc.d2xy(dd) === ((x, y)), s"round trip failed at ($x,$y)")
      assert(dd >= 0L && dd < (1L << 32), s"position out of range at ($x,$y): $dd")
    }
  }

  test("codegen and interpreted eval agree with the Scala kernel") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 3L), (7L, 7L), (255L, 1L), (1L, 255L),
      (65535L, 65535L), (40000L, 12345L))
    // codegen path (whole-stage over a local relation)
    val viaExpr = pts.toDF("x", "y")
      .select(col("x"), col("y"), HilbertIndex(col("x"), col("y")).as("h"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    for ((x, y) <- pts)
      assert(viaExpr((x, y)) === HilbertCalc.xy2d(x, y), s"codegen mismatch at ($x,$y)")
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    for ((x, y) <- pts) {
      val e = graft.functions.HilbertIndex(Literal(x), Literal(y))
      assert(e.eval(null) === HilbertCalc.xy2d(x, y), s"interpreted mismatch at ($x,$y)")
    }
  }

  test("q252: hilbert prune reads a strict subset; scan equals full filter") {
    val (all, sel, scan) = sources.Sources.zorderPruned(spark, d,
      tag = "hilbert_spec_store",
      clusterBy = df => df
        .withColumn("zval", HilbertIndex(col("user_id"), col("vbin")))
        .repartitionByRange(sources.Sources.ZPruneFiles, col("zval"))
        .sortWithinPartitions("zval"))
    assert(sel.toSet.subsetOf(all.toSet))
    assert(sel.nonEmpty, "predicate rectangle matched no file — fixture drift")
    assert(sel.size < all.size, s"no skipping: read ${sel.size} of ${all.size} files")
    val expected = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("vbin"), col("value"))
      .where(col("user_id").between(sources.Sources.ZPredU._1, sources.Sources.ZPredU._2)
        && col("vbin").between(sources.Sources.ZPredV._1, sources.Sources.ZPredV._2))
    assert(scan.count() === expected.count())
    assert(scan.exceptAll(expected).isEmpty && expected.exceptAll(scan).isEmpty)
  }

  test("hilbert per-file envelopes are no looser than lexicographic on vbin") {
    // the locality payoff, measured: mean per-file vbin envelope width
    // under the Hilbert layout vs the lexicographic (user_id, vbin) sort.
    // Lexicographic files span ~the full second dimension; Hilbert files
    // must be materially tighter (factor 2 is a loose floor — observed
    // gap is larger at every SF).
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    def meanVbinWidth(files: Seq[String]): Double = {
      val envs = spark.read.parquet(files: _*)
        .groupBy(input_file_name().as("p"))
        .agg(min("vbin").as("mn"), max("vbin").as("mx"))
        .collect()
      envs.map(r => (r.getAs[Long]("mx") - r.getAs[Long]("mn")).toDouble)
        .sum / envs.length
    }
    val (hilbertFiles, _, _) = sources.Sources.zorderPruned(spark, d,
      tag = "hilbert_env_store",
      clusterBy = df => df
        .withColumn("zval", HilbertIndex(col("user_id"), col("vbin")))
        .repartitionByRange(sources.Sources.ZPruneFiles, col("zval"))
        .sortWithinPartitions("zval"))
    val (lexFiles, _, _) = sources.Sources.zorderPruned(spark, d,
      tag = "lex_env_store",
      clusterBy = df => df
        .repartitionByRange(sources.Sources.ZPruneFiles, col("user_id"), col("vbin"))
        .sortWithinPartitions("user_id", "vbin"))
    val hw = meanVbinWidth(hilbertFiles)
    val lw = meanVbinWidth(lexFiles)
    assert(hw * 2.0 < lw,
      s"hilbert vbin envelopes ($hw) not materially tighter than lexicographic ($lw)")
  }
}
