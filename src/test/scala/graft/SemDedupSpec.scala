package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, element_at}

/** q117 SemDeDup contract: cluster-blocked semantic dedup must (a) be a
  * pure retention decision — survivors are a subset of the corpus and
  * something is actually dropped on this corpus, (b) honor the min-id
  * survivor rule within every cell, and (c) agree with the label-blocked
  * ground truth (q26) wherever the two blocking strategies overlap: a
  * label-blocked near-dup pair whose members land in the same k-means
  * cell must lose its higher member.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private lazy val assigned =
    queries.Similarity.ivfWithCells(spark, d, queries.Similarity.ivfCents(spark, d))
      .select(col("vec_id"), element_at(col("cells"), 1)("j").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val survivors =
    SparkEntry.queries("q117_semdedup")(spark, d)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet

  test("q117: survivors are a strict subset — duplicates exist and are dropped") {
    assert(survivors.subsetOf(assigned.keySet))
    assert(survivors.size < assigned.size,
      s"no duplicates dropped (${survivors.size} of ${assigned.size})")
  }

  test("q117: the smallest vec_id of every cell always survives") {
    assigned.groupBy(_._2).foreach { case (cell, members) =>
      val minId = members.keys.min
      assert(survivors.contains(minId), s"cell $cell dropped its min id $minId")
    }
  }

  test("q117: same-cell label-blocked near-dup pairs lose their higher member") {
    val labelPairs = SparkEntry.queries("q26_embedding_near_dup")(spark, d)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val sameCell = labelPairs.filter { case (a, b) => assigned(a) == assigned(b) }
    assert(sameCell.nonEmpty, "fixture drift: no q26 pair shares a cell")
    sameCell.foreach { case (a, b) =>
      assert(!survivors.contains(b), s"pair ($a,$b) shares a cell but $b survived")
    }
  }
}
