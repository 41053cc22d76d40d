package graft

import org.scalatest.funsuite.AnyFunSuite

/** q104 df-capped SimHash banding: the skew contract on a constructed
  * template-heavy corpus.
  *
  * 60 docs share ONE boilerplate text — identical signatures, so every
  * chunk bucket they occupy has df = 60 > MaxChunkDf = 50, and q83's
  * complete banding owes 60·59/2 = 1770 candidate pairs to those hot
  * buckets alone (the O(df²) quadratic that dominates at scale). One
  * additional RARE pair of identical docs sits in df = 2 buckets. The
  * cap must kill the entire hot-bucket pair set while the rare pair —
  * the kind of near-dup the detector exists for — survives with its
  * exact Hamming verify.
  */
class SimhashCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpusDir(): String = {
    val template = "the quick brown fox jumps over the lazy dog tonight"
    val rare = "zebra quagga okapi gnu eland kudu oryx topi"
    val rows =
      (1L to 60L).map(id => (id, template)) ++
        Seq((1001L, rare), (1002L, rare))
    val dir = java.nio.file.Files.createTempDirectory("graft_q104_spec").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q104 kills the hot-bucket quadratic; q83 (complete) pays it") {
    val dir = corpusDir()
    def pairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val complete = pairs("q83_simhash_pairs")
    assert(complete.size == 60 * 59 / 2 + 1,
      s"complete banding should see all template pairs + the rare pair, got ${complete.size}")

    val capped = pairs("q104_simhash_pairs_capped")
    assert(capped == Set((1001L, 1002L)),
      s"cap must drop every hot-bucket pair and keep the rare pair, got $capped")
  }
}
