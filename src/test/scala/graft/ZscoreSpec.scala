package graft

import org.scalatest.funsuite.AnyFunSuite

/** q134 z-score contract: recompute the moments with exact BigDecimal
  * sums in plain Scala and require bit-identical mean/sd/z per row; pin
  * the statistical identity the operator exists for — within every
  * group the z-scores average to ~0 with ~unit variance.
  */
class ZscoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q134: moments match exact decimal sums; groups standardize to (0, 1)") {
    val ev = Tables.events(spark, d)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))

    val moments = ev.groupBy(_._2).view.mapValues { rows =>
      val n = rows.length
      val sv = rows.map(r => BigDecimal(r._3).setScale(2)).sum.toDouble
      val svv = rows.map(r => (BigDecimal(r._3) * BigDecimal(r._3)).setScale(4)).sum.toDouble
      val mean = sv / n
      val sd = math.sqrt(math.max(svv / n - mean * mean, 0.0))
      (mean, sd)
    }.toMap

    val out = SparkEntry.queries("q134_zscore")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[String]("event_type"), r.getAs[Double]("mean"),
          r.getAs[Double]("sd"), r.getAs[Double]("value"), r.getAs[Double]("z")))).toMap

    assert(out.size == ev.length)
    ev.foreach { case (id, tpe, v) =>
      val (mean, sd) = moments(tpe)
      val (otpe, om, osd, ov, oz) = out(id)
      assert(otpe == tpe && om == mean && osd == sd && ov == v,
        s"row $id moments drifted: $om/$osd vs $mean/$sd")
      val expectZ = if (sd == 0.0) 0.0 else (v - mean) / sd
      assert(oz == expectZ, s"row $id z drift: $oz vs $expectZ")
    }
    out.values.groupBy(_._1).foreach { case (tpe, rows) =>
      val zs = rows.map(_._5)
      val zMean = zs.sum / zs.size
      val zVar = zs.map(z => (z - zMean) * (z - zMean)).sum / zs.size
      assert(math.abs(zMean) < 1e-9, s"$tpe z-mean $zMean")
      assert(math.abs(zVar - 1.0) < 1e-6, s"$tpe z-var $zVar")
    }
  }
}
