package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q264 contract — the robustness claim the oracle equality can't show:
  * on a clean line y = 2x with ONE corrupted point, the Theil–Sen
  * median slope stays at 2 while OLS is dragged far away (breakdown
  * point 0 vs ~29%).
  */
class RobustTrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q264: one corrupted point moves OLS but not Theil-Sen") {
    import spark.implicits._
    // corrupt the ENDPOINT — max leverage, where OLS hurts the most
    val pts = (0 until 20).map(x =>
      (x.toDouble, if (x == 19) 1000.0 else 2.0 * x))
    val df = pts.toDF("x", "y")
    val a = df.select(col("x").as("x1"), col("y").as("y1"))
    val b = df.select(col("x").as("x2"), col("y").as("y2"))
    val sen = a.crossJoin(b).where(col("x2") > col("x1"))
      .select(((col("y2") - col("y1")) / (col("x2") - col("x1"))).as("s"))
      .agg(expr("percentile(s, 0.5)")).head().getDouble(0)
    val ols = df.agg(expr("regr_slope(y, x)")).head().getDouble(0)
    assert(math.abs(sen - 2.0) < 0.05,
      s"Theil-Sen slope $sen moved off the clean trend")
    assert(math.abs(ols - 2.0) > 1.0,
      s"fixture too weak: OLS $ols barely moved — corruption not visible")
  }
}
