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

  test("q126: sketched gate tracks the exact gate (rows-only contract band)") {
    // q126 is rows-only by design (sketch thresholds are implementation-
    // defined); its contract lives here: the approx-percentile kept-set
    // must stay within a tight band of q120's exact kept-set, and no
    // source may be gutted or passed wholesale.
    val exact = SparkEntry.queries("q120_quality_gate")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    val approxRows = SparkEntry.queries("q126_quality_gate_approx")(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val approx = approxRows.map(_._1).toSet
    val total = Tables.documents(spark, d).count()

    val symDiff = ((exact -- approx) ++ (approx -- exact)).size
    assert(symDiff.toDouble / total <= 0.10,
      s"sketched gate drifted: $symDiff of $total docs differ from the exact gate")
    approxRows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.nonEmpty, s"source $src fully gutted by the sketched gate")
    }
  }
}
