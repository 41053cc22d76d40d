package graft

import org.scalatest.funsuite.AnyFunSuite

/** q115 content-defined chunking: the SHIFT-ROBUSTNESS property that
  * justifies CDC over fixed-width segmentation — after a prefix edit,
  * content-defined boundaries realign within ~one hash window, so most
  * chunk fingerprints survive; fixed-width boundaries all shift, so
  * none do.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(df: org.apache.spark.sql.DataFrame, id: Long): Seq[String] =
    df.where(org.apache.spark.sql.functions.col("doc_id") === id)
      .collect().map(_.getAs[String]("chunk_fp")).toSeq

  test("q115: a prefix edit preserves most CDC chunk fingerprints; fixed-width preserves none") {
    import spark.implicits._
    // deterministic pseudo-text, long enough for ~10 chunks
    val base = (1 to 60).map(i => s"tok${i * 7 % 53}").mkString(" ")
    val shifted = "inserted preamble " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = queries.Dedup.cdcChunks(docs)

    val a = fps(chunks, 1L)
    val b = fps(chunks, 2L).toSet
    assert(a.size >= 5, s"base doc produced only ${a.size} chunks — tune the test text")
    val survived = a.count(b.contains).toDouble / a.size
    info(f"CDC chunk-fp survival after prefix edit: $survived%.2f (${a.size} chunks)")
    assert(survived >= 0.5,
      f"CDC survival $survived%.2f < 0.5 — boundaries did not realign")

    // the fixed-width strawman on the same pair: every boundary shifts
    // by the prefix length, so no 32-char chunk fingerprint survives
    def fixedFps(s: String): Seq[String] = s.grouped(32).toSeq
    val fixedSurvived = {
      val bs = fixedFps(shifted).toSet
      fixedFps(base).count(bs.contains)
    }
    assert(fixedSurvived === 0,
      s"fixed-width unexpectedly preserved $fixedSurvived chunks")
  }

  test("q115: chunks tile each document exactly (no gaps, no overlap)") {
    import spark.implicits._
    val text = (1 to 80).map(i => s"w${i * 13 % 97}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = queries.Dedup.cdcChunks(docs)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("start"), r.getAs[Long]("chunk_len")))
    assert(rows.head._1 === 1L)
    rows.sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => assert(s1 + l1 === s2, "gap or overlap between chunks")
      case _ =>
    }
    assert(rows.last._1 + rows.last._2 - 1 === text.length.toLong)
  }
}
