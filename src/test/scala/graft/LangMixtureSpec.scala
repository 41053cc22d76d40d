package graft

import org.scalatest.funsuite.AnyFunSuite

/** q159 differential: replay paragraph segmentation (16-word windows of
  * the space-split token stream), q30's marker argmax with its CASE tie
  * order, and the per-doc majority fold in plain Scala; require exact
  * agreement including the majority tie-break (highest count, then
  * lexicographically smallest language). Plus the structural contract:
  * counts partition, maj_frac ∈ (0, 1], is_mixed ⇔ n_langs > 1.
  */
class LangMixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private val markers = Seq(
    "de" -> Seq("table", "row"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("query", "scan"),
    "fr" -> Seq("window", "sort"),
    "zh" -> Seq("vector", "stream"))

  test("q159 matches a plain-Scala paragraph lang-ID replay") {
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))

    def predict(pws: Seq[String]): String = {
      val scores = markers.map { case (l, ms) => l -> pws.count(ms.contains) }.toMap
      markers.map(_._1).find { l =>
        markers.map(_._1).filter(_ != l).forall(o => scores(l) >= scores(o))
      }.getOrElse(markers.last._1)
    }

    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val nParas = math.ceil(ws.length / 16.0).toInt
      val preds = (0 until nParas).map(i => predict(ws.slice(i * 16, i * 16 + 16)))
      val counts = preds.groupBy(identity).map { case (l, p) => (l, p.length) }
      val (majLang, majCnt) = counts.toSeq.minBy { case (l, c) => (-c, l) }
      id -> ((nParas.toLong, counts.size.toLong, majLang,
        majCnt.toDouble / nParas.toDouble,
        if (counts.size > 1) 1L else 0L))
    }.toMap

    val got = SparkEntry.queries("q159_lang_mixture")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_langs"), r.getAs[String]("maj_lang"),
        r.getAs[Double]("maj_frac"), r.getAs[Long]("is_mixed"))))
      .toMap

    assert(got == expected)
    assert(got.nonEmpty)
    got.values.foreach { case (nParas, nLangs, _, frac, mixed) =>
      assert(nLangs >= 1 && nLangs <= nParas)
      assert(frac > 0.0 && frac <= 1.0)
      assert((mixed == 1L) == (nLangs > 1))
    }
    assert(got.values.exists(_._5 == 1L) || got.values.forall(_._1 == 1L),
      "no mixed docs AND multi-paragraph docs exist — argmax may be degenerate")
  }
}
