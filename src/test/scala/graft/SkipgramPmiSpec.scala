package graft

import org.scalatest.funsuite.AnyFunSuite

/** q296 skip-gram PPMI differential: replay the ±2-window pair
  * generation, marginals, and quantized PPMI in plain Scala and require
  * the query's top-50 to match exactly (same (ppmi desc, wa, wb) total
  * order).
  */
class SkipgramPmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q296 matches a plain-Scala replay of windowed pairs and PPMI") {
    val texts = Tables.documents(spark, d).select("text").collect()
      .map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val ws = t.split(" ", -1)
      val k1 = ws.indices.dropRight(1).map(i => (ws(i), ws(i + 1)))
      val k2 = ws.indices.dropRight(2).map(i => (ws(i), ws(i + 2)))
      (k1 ++ k2).filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    }
    val cooc = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ca = cooc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cb = cooc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val np = cooc.values.sum
    val expected = cooc.toSeq
      .filter(_._2 >= 5L)
      .map { case ((wa, wb), c) =>
        val raw = math.log(c.toDouble * np.toDouble
          / (ca(wa).toDouble * cb(wb).toDouble))
        val ppmi = math.floor(math.max(raw, 0.0) * 1e6 + 0.5) / 1e6
        (wa, wb, c, ppmi)
      }
      .sortBy { case (wa, wb, _, p) => (-p, wa, wb) }
      .take(50)

    val out = SparkEntry.queries("q296_skipgram_pmi")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == expected)
  }
}
