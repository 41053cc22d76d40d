package graft

import org.scalatest.funsuite.AnyFunSuite

/** q334 greedy max-coverage: a plain-Scala greedy replay over the same
  * candidate pool, plus the submodularity evidence — gains are
  * non-increasing across picks, covered_total is the true union size at
  * every step, and coverage interaction is LIVE (some later pick's gain
  * is strictly below that doc's own gram count — overlap actually
  * reduced a gain, else the greedy objective is vacuous).
  */
class CoverageSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q334 equals a plain-Scala greedy replay; gains non-increasing; interaction live") {
    val grams = graft.functions.TextFns
      .wordGrams(Tables.documents(spark, d), 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDoc = grams.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val cand = byDoc.toSeq.sortBy { case (id, gs) => (-gs.size, id) }.take(12)
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val covered = scala.collection.mutable.Set.empty[String]
    (1 to 5).foreach { _ =>
      val (doc, gain) = cand.filterNot(c => sel.exists(_._1 == c._1))
        .map { case (id, gs) => (id, (gs -- covered).size.toLong) }
        .minBy { case (id, g) => (-g, id) }
      sel += ((doc, gain))
      covered ++= byDoc(doc)
    }
    val expected = sel.zipWithIndex.map { case ((doc, gain), i) =>
      (i + 1L) -> ((doc, gain, sel.take(i + 1).map(_._2).sum))
    }.toMap
    val out = SparkEntry.queries("q334_coverage_select")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == expected, s"greedy coverage replay diverges:\n got $out\n exp $expected")

    // covered_total at the last pick is the true union of selected sets
    assert(out(5L)._3 == sel.map(_._1).flatMap(byDoc).toSet.size.toLong)
    // submodularity: greedy gains never increase
    val gains = (1L to 5L).map(out(_)._2)
    assert(gains == gains.sortBy(-_), s"gains increased: $gains")
    // interaction liveness: some pick paid an overlap penalty
    assert((1L to 5L).exists(k => out(k)._2 < byDoc(out(k)._1).size),
      "every pick's gain equals its full gram count — coverage never interacted")
  }
}
