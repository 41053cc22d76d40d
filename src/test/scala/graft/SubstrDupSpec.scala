package graft

import org.scalatest.funsuite.AnyFunSuite

/** q165 differential contract: recompute every document's duplicated
  * 8-word-window count with an independent plain-Scala reimplementation
  * (one in-memory occurrence map over the raw window STRINGS — no md5,
  * no Spark, no SQL shared with the query) and require exact agreement
  * on all three output columns. Also pins the semantics the operator
  * exists for: corpus-repeated windows exist and are counted (total
  * duplicated windows > 0), a window repeated only WITHIN one doc still
  * counts (occurrence ≥ 2, not distinct-doc ≥ 2), and the output is
  * TOTAL (one row per document; the generated corpus has no doc under 8
  * tokens, so the short-doc zero row is covered by the replay being
  * exhaustive rather than by a dedicated fixture).
  */
class SubstrDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q165: per-doc counts match an independent occurrence-map replay") {
    val rows = SparkEntry.queries("q165_substr_dup_fraction")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Double]("dup_frac"))))
      .toMap

    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val windows = texts.map { case (id, t) =>
      val ws = t.split(" ", -1)
      (id, if (ws.length < 8) Array.empty[String]
           else Array.tabulate(ws.length - 7)(i => ws.slice(i, i + 8).mkString(" ")))
    }
    val occ = new scala.collection.mutable.HashMap[String, Int]()
    windows.foreach { case (_, ws) => ws.foreach(w => occ.update(w, occ.getOrElse(w, 0) + 1)) }

    assert(rows.size == texts.length, "not total: one row per document expected")
    var totalDup = 0L
    windows.foreach { case (id, ws) =>
      val nDup = ws.count(occ(_) >= 2).toLong
      totalDup += nDup
      val expected = (ws.length.toLong, nDup,
        if (ws.isEmpty) 0.0 else nDup.toDouble / ws.length)
      assert(rows(id) == expected, s"doc $id: ${rows(id)} != $expected")
    }
    assert(totalDup > 0, "corpus has no repeated 8-gram windows — metric untested")
  }
}
