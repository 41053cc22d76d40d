package graft

import org.scalatest.funsuite.AnyFunSuite

/** q297 containment contract:
  *   - the definition itself on a planted asymmetric case (a short text
  *     quoted inside a long one: containment ≈ 1 while Jaccard is small
  *     — the catch class the query exists for);
  *   - on the fixture, containment dominates Jaccard row-wise
  *     (C(A→B) = c/|A| ≥ c/|A∪B| always) and every q73 capped-Jaccard
  *     pair is also a containment pair (J ≥ θ ⇒ max-containment ≥ θ).
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def trigrams(t: String): Set[String] =
    t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet

  test("a quoted substring has high containment but low Jaccard") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = ("padding" +: (1 to 40).map(i => s"w$i")).mkString(" ") +
      " " + short + " " + (41 to 80).map(i => s"w$i").mkString(" ")
    val a = trigrams(short); val b = trigrams(long)
    val c = (a intersect b).size.toDouble
    val cont = c / a.size
    val jac = c / (a ++ b).size
    assert(cont == 1.0, s"quoted text not fully contained: $cont")
    assert(jac < 0.1, s"Jaccard unexpectedly high: $jac")
  }

  test("q297: containment dominates Jaccard and covers every capped-Jaccard pair") {
    val rows = SparkEntry.queries("q297_containment_dedup")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(5), r.getDouble(6), r.getDouble(7))))
    assert(rows.nonEmpty, "fixture produced no containment pairs")
    rows.foreach { case ((da, db), (cab, cba, j)) =>
      assert(cab >= j && cba >= j, s"($da,$db): containment below Jaccard")
      assert(cab <= 1.0 && cba <= 1.0 && cab > 0 && cba > 0)
    }
    val capped = SparkEntry.queries("q73_ngram_jaccard_capped")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val contPairs = rows.map(_._1).toSet
    assert(capped.subsetOf(contPairs),
      s"Jaccard pairs missing from containment: ${capped -- contPairs}")
  }
}
