package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** q107 truncated-prefix + rerank: the two-stage contract. Stage 1's
  * 32-dim prefix ranking is 2× cheaper but lossy; the full-dimension
  * rerank over its top-40 must recover exact-top-5 recall at least as
  * well as trusting the truncated ranking outright — otherwise the
  * second stage is cost without benefit. (Observed here: 0.20
  * truncated-only vs 0.675 reranked.)
  */
class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("q107: full-dim rerank recovers recall the truncated ranking loses") {
    val exact = pairs(SparkEntry.queries("q27_cosine_topk")(spark, d)
      .where(col("rnk") <= 5))
    // arm 1: trust the 32-dim prefix ranking outright (top-5 direct)
    val truncOnly = pairs(queries.Similarity.truncCandidates(spark, d, 5)
      .select(col("probe_id"), col("neighbor_id")))
    // arm 2: the registered two-stage query
    val reranked = pairs(SparkEntry.queries("q107_matryoshka_rerank")(spark, d))

    val rTrunc = (exact intersect truncOnly).size.toDouble / exact.size
    val rRerank = (exact intersect reranked).size.toDouble / exact.size
    info(f"recall vs exact top-5: truncated-only=$rTrunc%.3f reranked=$rRerank%.3f")
    assert(rRerank >= rTrunc,
      f"rerank ($rRerank%.3f) must not lose recall vs truncated-only ($rTrunc%.3f)")
    assert(rRerank >= 0.5, f"reranked recall $rRerank%.3f below the ANN floor")
  }
}
