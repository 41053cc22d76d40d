package graft

import org.scalatest.funsuite.AnyFunSuite

/** q124 novelty differential contract: recompute every document's
  * distinct 5-grams and their corpus-wide first owner with plain Scala
  * collections and require exact agreement — catches gram-construction
  * drift vs q82's shared builder, min-owner ties, and the gramless-doc
  * total-function rule. Structural anchors: the lowest doc_id is fully
  * novel, and rates stay in [0, 1].
  */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q124: novelty matches a plain-Scala first-owner recomputation") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    def grams(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      if (ws.length < 5) Set.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
    }
    val firstOwner = docs.flatMap { case (id, t) => grams(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap

    val expected = docs.map { case (id, t) =>
      val gs = grams(t)
      val novel = gs.count(firstOwner(_) == id)
      id -> ((gs.size.toLong, novel.toLong,
        if (gs.isEmpty) 1.0 else novel.toDouble / gs.size))
    }.toMap

    val out = SparkEntry.queries("q124_novelty")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap

    assert(out == expected,
      s"drift on ${out.keySet.filter(k => out(k) != expected.getOrElse(k, null)).take(5)}")
    assert(out(docs.map(_._1).min)._3 == 1.0, "the first-ingested doc must be fully novel")
    assert(out.values.forall { case (_, _, r) => r >= 0.0 && r <= 1.0 })
  }
}
