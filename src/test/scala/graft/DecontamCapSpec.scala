package graft

import org.scalatest.funsuite.AnyFunSuite

/** q106 df-capped decontamination: both halves of the cap's rationale
  * pinned on a constructed corpus (the SimhashCapSpec pattern).
  *
  * 60 train docs and one benchmark doc share ONE boilerplate sentence —
  * its 5-grams have df = 61 > MaxGram5Df = 50, so uncapped q82 flags
  * all 60 train docs as "contaminated" by boilerplate (false positives,
  * O(df²) join work). One train doc genuinely leaks a RARE benchmark
  * passage (df = 2 per gram). The cap must erase the boilerplate flags
  * and keep the real leak with its full shared-gram count.
  */
class DecontamCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // doc_id % 101 == 0 → benchmark side (q82/q86/q106 convention)
  private def corpusDir(): String = {
    val boiler = "subscribe to our newsletter for the latest updates and offers today"
    val leaked = "the mitochondria is the powerhouse of the eukaryotic cell body"
    val rows =
      (1L to 60L).map(id => (id, boiler)) ++ // train boilerplate
        Seq(
          (202L, boiler), // benchmark doc carrying the same boilerplate
          (70L, leaked), // train doc with the genuine leak
          (101L, leaked)) // benchmark doc it leaked from
    val dir = java.nio.file.Files.createTempDirectory("graft_q106_spec").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q106 erases boilerplate flags, keeps the genuine leak; q82 pays the quadratic") {
    val dir = corpusDir()
    def flags(q: String): Map[(Long, Long), Long] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // 10-word leaked sentence → 6 distinct 5-grams
    val uncapped = flags("q82_decontaminate")
    assert(uncapped.keySet ==
      (1L to 60L).map(_ -> 202L).toSet + ((70L, 101L)),
      s"uncapped should flag all 60 boilerplate pairs + the leak, got ${uncapped.keySet.size}")

    val capped = flags("q106_decontaminate_capped")
    assert(capped == Map((70L, 101L) -> 6L),
      s"cap must keep exactly the leaked pair with its full gram count, got $capped")
  }
}
