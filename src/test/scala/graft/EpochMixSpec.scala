package graft

import org.scalatest.funsuite.AnyFunSuite

/** q121 epoch-repeat contract: every language's rows are exactly
  * n_l × min(4, ⌈max_n / n_l⌉), the dominant language is never
  * repeated, copies are dense 1..epochs per doc, and the shuffle keys
  * are globally unique (a key collision would co-locate two copies the
  * interleave exists to separate).
  */
class EpochMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q121: per-language epoch counts, dense copies, unique shuffle keys") {
    val rows = SparkEntry.queries("q121_epoch_mix")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("copy"), r.getAs[String]("skey")))
    assert(rows.nonEmpty)

    val docsPerLang = rows.filter(_._3 == 1L).groupBy(_._2).view.mapValues(_.length).toMap
    val maxN = docsPerLang.values.max
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = docsPerLang(lang)
      val epochs = math.min(4L, (maxN + n - 1L) / n)
      assert(rs.length == n * epochs, s"$lang: ${rs.length} rows, want ${n * epochs}")
      rs.groupBy(_._1).foreach { case (id, copies) =>
        assert(copies.map(_._3).sorted.sameElements(1L to epochs),
          s"doc $id in $lang has non-dense copies")
      }
    }
    val dominant = docsPerLang.maxBy(_._2)._1
    assert(rows.filter(_._2 == dominant).forall(_._3 == 1L),
      s"dominant language $dominant should run a single epoch")
    assert(rows.length > docsPerLang.values.sum, "no language was repeated")
    assert(rows.map(_._4).distinct.length == rows.length, "shuffle key collision")
  }
}
