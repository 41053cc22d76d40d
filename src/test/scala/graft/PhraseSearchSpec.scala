package graft

import org.scalatest.funsuite.AnyFunSuite

/** q119 phrase search differential contract: the posting-list
  * intersection must agree EXACTLY with a direct token walk over the raw
  * text — an independent reimplementation (no positional index, no
  * Spark joins) counting i where ws(i) = w1 and ws(i+1) = w2. Catches
  * off-by-one position encodings, intersection dedup bugs, and empty-
  * token handling drift between the index build and the query.
  */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q119: hit counts match a direct token walk over the raw text") {
    val out = SparkEntry.queries("q119_phrase_search")(spark, d)
      .collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("doc_id")) -> r.getAs[Long]("hits"))
      .toMap
    assert(out.nonEmpty, "phrase search returned nothing")

    val phrases = out.keys.map(_._1).toSet.toSeq.map { p: String =>
      val Array(w1, w2) = p.split(" ", 2); (p, w1, w2)
    }
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    val expected = (for {
      (docId, text) <- docs
      ws = text.split(" ", -1)
      (p, w1, w2) <- phrases
      hits = (0 until ws.length - 1)
        .count(i => ws(i) == w1 && ws(i + 1) == w2 && ws(i).nonEmpty)
      if hits > 0
    } yield (p, docId) -> hits.toLong).toMap

    assert(out == expected,
      s"drift: only-in-query=${(out.keySet -- expected.keySet).take(5)} " +
        s"only-in-walk=${(expected.keySet -- out.keySet).take(5)}")
  }
}
