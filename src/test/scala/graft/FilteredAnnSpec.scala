package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** q131 filtered-search contract: (a) every returned neighbor satisfies
  * the metadata predicate, and (b) the operator is NOT the naive
  * post-filter — filtering q63's unfiltered top-5 afterwards must yield
  * strictly fewer result rows than q131 returns, the exact deficiency
  * (under-filled top-k) that corpus-side filtering exists to fix.
  */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q131: neighbors satisfy the predicate; beats post-filtering q63") {
    val eligible = Tables.embeddings(spark, d)
      .where(col("label") % 3 === 0)
      .collect().map(_.getAs[Long]("vec_id")).toSet

    val filtered = SparkEntry.queries("q131_ann_filtered")(spark, d)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
    assert(filtered.nonEmpty)
    filtered.foreach { case (p, n) =>
      assert(eligible(n), s"probe $p returned ineligible neighbor $n")
    }

    val postFiltered = SparkEntry.queries("q63_ann_ivf")(spark, d)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .filter { case (_, n) => eligible(n) }
    assert(postFiltered.length < filtered.length,
      s"post-filter kept ${postFiltered.length} ≥ q131's ${filtered.length} — " +
        "the corpus-side filter is buying nothing on this fixture")
  }
}
