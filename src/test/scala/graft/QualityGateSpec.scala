package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** q120 per-source quality gate differential contract: recompute the
  * rank-median and the kept set in plain Scala from q31's scores and the
  * raw source column, and require exact agreement — catches drift in the
  * median rank definition ((n+1) DIV 2), the null-source coalesce, and
  * the >= boundary. Also pins the structural guarantee the operator
  * exists for: every source retains at least half its documents.
  */
class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q120: kept set matches a plain-Scala rank-median gate, ≥ half per source") {
    val scores = SparkEntry.queries("q31_quality_score")(spark, d)
      .select("doc_id", "quality").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val sources = Tables.documents(spark, d)
      .select(col("doc_id"), coalesce(col("source"), lit("unknown")).as("source"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap

    val bySource = sources.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    val expected = bySource.flatMap { case (src, ids) =>
      val ordered = ids.sortBy(id => (scores(id), id))
      val med = scores(ordered((ordered.size + 1) / 2 - 1))
      ids.filter(scores(_) >= med).map(id => id -> (src, med))
    }

    val out = SparkEntry.queries("q120_quality_gate")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Double]("med")))).toMap

    assert(out == expected,
      s"drift: only-in-query=${(out.keySet -- expected.keySet).take(5)} " +
        s"only-in-scala=${(expected.keySet -- out.keySet).take(5)}")
    bySource.foreach { case (src, ids) =>
      val kept = ids.count(out.contains)
      assert(kept * 2 >= ids.size, s"source $src kept $kept of ${ids.size}")
    }
  }

  test("q126: audit booleans match an independent recomputation of the band (hash-gate liveness)") {
    // q126 is hash-gated on the contract's audit booleans (the q103
    // discipline); this spec proves the booleans are COMPUTED, not
    // constants: re-derive the symmetric-difference band and per-source
    // kept counts from the factored sketch path + q120, and require the
    // query's booleans to equal the independently computed predicates.
    val exact = SparkEntry.queries("q120_quality_gate")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    val approxRows = queries.TextAnalysis.sketchKept(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val approx = approxRows.map(_._1).toSet
    val total = Tables.documents(spark, d).count()
    val symDiff = ((exact -- approx) ++ (approx -- exact)).size
    val expectBand = 10L * symDiff <= total
    val keptBySrc = approxRows.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val out = SparkEntry.queries("q126_quality_gate_approx")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Boolean]("band_ok") == expectBand,
        s"band_ok diverged from the recomputed band (symDiff=$symDiff of $total)")
      assert(r.getAs[Boolean]("kept_nonempty") == (keptBySrc.getOrElse(src, 0L) >= 1L),
        s"kept_nonempty for $src diverged from the recomputed sketch kept-set")
      assert(r.getAs[Long]("n_kept_exact") * 2 >= r.getAs[Long]("n_docs"),
        s"exact gate kept under half of source $src")
    }
    // the contract itself (what the oracle's TRUEs assert) must hold
    assert(expectBand, s"sketched gate drifted: $symDiff of $total docs differ")
    assert(keptBySrc.values.forall(_ >= 1L), "a source was fully gutted")
  }
}
