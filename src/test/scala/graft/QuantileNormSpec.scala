package graft

import org.scalatest.funsuite.AnyFunSuite

/** q305 quantile normalization: independent sequential replay (sort
  * the pool, sort each group, map rank r of n_g to the pooled value at
  * ⌈r·N/n_g⌉) — the distributed two-phase enumeration + window + join
  * must agree row-for-row. Plus the two properties the transform
  * exists for: within each group the mapping is MONOTONE in the
  * original value (rank order preserved), and each group's max maps
  * to the pooled maximum (rank n_g hits ⌈N⌉ exactly).
  */
class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q305 equals a sequential rank-mapping replay; monotone per group") {
    import org.apache.spark.sql.functions._
    val rows = Tables.events(spark, d)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pooled = rows.map(t => (t._3, t._1)).sorted.map(_._1)
    val n = pooled.length.toLong
    val expected = rows.groupBy(_._2).iterator.flatMap { case (_, es) =>
      val ng = es.length.toLong
      es.sortBy(e => (e._3, e._1)).zipWithIndex.map { case ((id, tpe, c), i) =>
        val target = ((i + 1) * n + ng - 1) / ng
        id -> ((tpe, c, pooled((target - 1).toInt)))
      }
    }.toMap
    val got = SparkEntry.queries("q305_quantile_norm")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, s"quantile-norm replay diverged (${got.size}/${expected.size})")
    got.groupBy(_._2._1).foreach { case (tpe, m) =>
      val byRank = m.toSeq
        .sortBy { case (id, (_, c, _)) => (c, id) }.map(_._2._3)
      assert(byRank == byRank.sorted, s"$tpe: mapping not monotone")
      assert(byRank.last == pooled.last, s"$tpe: group max must map to pooled max")
    }
  }
}
