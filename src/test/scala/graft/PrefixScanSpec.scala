package graft

import org.scalatest.funsuite.AnyFunSuite

/** q153 token-budget differential: replay the selection in plain Scala —
  * sort the q31-scored docs by (quality desc, doc_id), accumulate token
  * counts sequentially, cut at half the corpus token mass — and require
  * exact agreement with the distributed two-phase scan. Then pin the
  * budget-boundary contract: the kept mass fits, the next document in
  * order would overflow, and cum_tokens is the exact running total (so
  * the scan's partition offsets are seam-free across every partition
  * boundary the range repartition happened to pick).
  */
class PrefixScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val scored = queries.TextAnalysis.qualityScore.fn(spark, d)
    .select("doc_id", "n_tokens", "quality").collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Double]("quality")))

  private lazy val inOrder =
    scored.sortBy { case (id, _, q) => (-q, id) }.toSeq

  test("q153 matches a sequential replay of the budget cut") {
    val total = scored.map(_._2).sum
    val budget = total / 2
    var run = 0L
    val expected = inOrder.iterator.map { case (id, tok, q) =>
      run += tok; (id, tok, q, run)
    }.takeWhile(_._4 <= budget).toVector

    val got = SparkEntry.queries("q153_token_budget")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens")))
      .sortBy(_._4)
      .toVector

    assert(got == expected)
  }

  test("q153 fills the budget: the next document in order would overflow") {
    val total = scored.map(_._2).sum
    val budget = total / 2
    val got = SparkEntry.queries("q153_token_budget")(spark, d).collect()
    val keptMass = got.map(_.getAs[Long]("n_tokens")).sum
    assert(keptMass <= budget)
    val keptIds = got.map(_.getAs[Long]("doc_id")).toSet
    val next = inOrder.find(r => !keptIds.contains(r._1))
    next.foreach { case (_, tok, _) =>
      assert(keptMass + tok > budget, "a skipped doc still fits the budget")
    }
  }
}
