package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, element_at}

/** q111 IVF-PQ: the two halves of the product-quantization trade —
  * RECALL (ADC scoring + exact rerank must stay near the full-precision
  * IVF scan it replaces) and COMPRESSION (the encoded corpus carries 8
  * small code ids, never the vector).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("q111: ADC + exact rerank holds a recall floor vs the full-precision IVF scan") {
    val exact = pairs(SparkEntry.queries("q27_cosine_topk")(spark, d)
      .where(col("rnk") <= 5))
    val ivf = pairs(SparkEntry.queries("q63_ann_ivf")(spark, d))
    val pq = pairs(SparkEntry.queries("q111_ann_ivf_pq")(spark, d))

    val rIvf = (exact intersect ivf).size.toDouble / exact.size
    val rPq = (exact intersect pq).size.toDouble / exact.size
    info(f"recall vs exact top-5: ivf full-precision=$rIvf%.3f ivf-pq=$rPq%.3f")
    // Both search the same probed cells; PQ can only lose candidates at
    // the ADC cut (quantization error vs the true dot). The exact rerank
    // over RerankCand=40 must keep that loss inside a 0.15 band, above
    // an absolute floor.
    assert(rPq >= rIvf - 0.15,
      f"pq recall $rPq%.3f fell more than 0.15 below full-precision $rIvf%.3f")
    assert(rPq >= 0.4, f"pq recall $rPq%.3f below the floor")
  }

  test("q111: encoded corpus carries codes only — the compression contract") {
    val ev = queries.Similarity.ivfWithCells(spark, d, queries.Similarity.ivfCents(spark, d))
    val corpus = ev.select(col("vec_id"), col("v"),
      element_at(col("cells"), 1)("j").as("cell"))
    val enc = queries.Similarity.pqEncode(corpus,
      queries.Similarity.pqBooksRow(queries.Similarity.pqBooks(spark, d)))
    // schema: the vector column must be GONE from the stored form
    assert(enc.columns.toSeq === Seq("vec_id", "cell", "codes"),
      s"encoded schema leaks more than codes: ${enc.columns.mkString(",")}")
    val rows = enc.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(codes.size === 8, s"expected 8 subspace codes, got ${codes.size}")
      assert(codes.forall(c => c >= 0 && c < 8), s"code out of range: $codes")
    }
    // 8 codes of 8 values fit 8 bytes (3 bits each, byte-aligned) vs
    // 64 float32 = 256 bytes stored / 64 float64 = 512 bytes in the
    // working form: >= 32x smaller per vector in the inverted file
    assert(8 * 1 * 32 <= 64 * 4)
  }

  test("q114: the materialized PQ index is materially smaller than q76's full-vector file") {
    // run both materializations in THIS JVM (scratch is JVM-keyed),
    // then compare actual on-disk bytes — the serving-memory claim as
    // a measured fact, not an arithmetic identity
    SparkEntry.queries("q76_ann_ivf_file")(spark, d).collect()
    SparkEntry.queries("q114_ann_ivf_pq_file")(spark, d).collect()
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally walk.close()
    }
    val full = dirBytes(sources.Sources.scratchLeaf(d, "ivf_inverted_file"))
    val pq = dirBytes(sources.Sources.scratchLeaf(d, "ivf_pq_file"))
    info(f"on-disk bytes: full-vector index=$full pq index=$pq ratio=${pq.toDouble / full}%.3f")
    // parquet metadata overhead dominates at test scale, so the bound
    // is loose; the per-row payload ratio is 64 doubles : 8 small ints
    assert(pq < full * 6 / 10, s"pq index $pq not materially smaller than $full")
  }
}
