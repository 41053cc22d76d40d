package graft

import org.scalatest.funsuite.AnyFunSuite

/** q122 OOV-rate differential contract: recompute the top-20 vocabulary
  * and every document's OOV fraction with plain Scala collections over
  * the raw text, and require exact agreement — catches vocab tie-break
  * drift at the K boundary, join-side null handling, and the empty-doc
  * total-function rule (rate 0.0, never null or NaN).
  */
class OovRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q122: rates match a plain-Scala recomputation; rates bounded in [0,1]") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    val counts = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length).toMap
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet

    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val oov = ws.count(!vocab(_))
      id -> ((ws.length.toLong, oov.toLong,
        if (ws.isEmpty) 0.0 else oov.toDouble / ws.length))
    }.toMap

    val out = SparkEntry.queries("q122_oov_rate")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate")))).toMap

    assert(out == expected,
      s"drift on ${out.keySet.filter(k => out(k) != expected.getOrElse(k, null)).take(5)}")
    assert(out.values.forall { case (_, _, r) => r >= 0.0 && r <= 1.0 })
  }
}
