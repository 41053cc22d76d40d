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

  // ---- the k dial (k ≈ n/⌀cell at scale): a second centroid count ----

  private val K2 = 16

  private def cellsAt(k: Int): Map[Long, Long] =
    queries.Similarity.ivfWithCells(spark, d,
        queries.Similarity.ivfCents(spark, d, queries.Similarity.IvfLloydSteps, k))
      .select(col("vec_id"), element_at(col("cells"), 1)("j").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def survivorsAt(k: Int): Set[Long] =
    queries.Similarity.semDedupRetained(spark, d, k)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet

  /** Brute-force UNBLOCKED dedup (k = 1 limit): every finite-cosine pair
    * ≥ threshold drops its higher id. Any blocked run can only compare a
    * SUBSET of these pairs, so for every k: dropped(k) ⊆ droppedBrute.
    */
  private lazy val droppedBrute: Set[Long] = {
    val vs = queries.Similarity.vectors(spark, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val norms = vs.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    val out = scala.collection.mutable.Set.empty[Long]
    for (a <- vs.indices; b <- (a + 1) until vs.length) {
      var dot = 0.0; var i = 0
      val va = vs(a)._2; val vb = vs(b)._2
      while (i < va.length) { dot += va(i) * vb(i); i += 1 }
      val raw = dot / (norms(a) * norms(b))
      if (java.lang.Double.isFinite(raw) &&
          math.floor(raw * 1e6 + 0.5) / 1e6 >= queries.Similarity.NearDupThreshold)
        out += vs(b)._1
    }
    out.toSet
  }

  test(s"q117 at k=$K2: cells shrink — more occupied cells, smaller max cell") {
    val c8 = cellsAt(8); val c16 = cellsAt(K2)
    val occupied8 = c8.values.toSet.size
    val occupied16 = c16.values.toSet.size
    val maxCell8 = c8.groupBy(_._2).map(_._2.size).max
    val maxCell16 = c16.groupBy(_._2).map(_._2.size).max
    assert(occupied16 > occupied8,
      s"doubling k did not add occupied cells ($occupied8 -> $occupied16)")
    assert(maxCell16 < maxCell8,
      s"doubling k did not shrink the largest cell ($maxCell8 -> $maxCell16)")
  }

  test(s"q117 at k=$K2: drops are sound (subset of unblocked ground truth) and converge") {
    val drops8 = cellsAt(8).keySet -- survivorsAt(8)
    val drops16 = cellsAt(K2).keySet -- survivorsAt(K2)
    assert(drops8.subsetOf(droppedBrute), "k=8 dropped a non-near-dup")
    assert(drops16.subsetOf(droppedBrute), "k=16 dropped a non-near-dup")
    // the k dial's tradeoff, pinned: larger k → smaller cells → fewer
    // compared pairs, so recall vs the unblocked ground truth can only
    // shrink — but must keep a floor (SemDeDup's thesis: semantic dups
    // co-cluster, so blocking keeps catching a solid share of them).
    // Empirical at this corpus: recall ~0.34 at k=16.
    assert(droppedBrute.nonEmpty, "fixture drift: no unblocked near-dups")
    assert(drops16.nonEmpty, s"k=$K2 blocking caught nothing")
    val recall8 = drops8.size.toDouble / droppedBrute.size
    val recall16 = drops16.size.toDouble / droppedBrute.size
    assert(recall16 <= recall8,
      s"smaller cells cannot compare MORE pairs ($recall8 -> $recall16)")
    assert(recall16 >= 0.3, s"k=$K2 recall vs unblocked fell to $recall16")
  }

  test("q177: the salted block loop retains exactly q117's survivor set") {
    val plain = SparkEntry.queries("q117_semdedup")(spark, d)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    val salted = SparkEntry.queries("q177_semdedup_salted")(spark, d)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    assert(salted === plain, "salting changed the dedup answer")
    // the fixture must really exercise multi-group cells, or the
    // completeness claim (cross-group pairs) was never tested
    val maxCell = assigned.groupBy(_._2).map(_._2.size).max
    assert(maxCell > queries.Similarity.SemDedupBlockCap,
      s"largest cell $maxCell under the ${queries.Similarity.SemDedupBlockCap} block cap — salting untested")
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
