package graft

import org.scalatest.funsuite.AnyFunSuite

/** q151 prefix-filtering contracts, split across two datasets because they
  * stress opposite properties:
  *   - EXACTNESS on the real corpus — q151 must equal q24 (the brute-force
  *     all-pairs trigram Jaccard at the same 0.8 threshold) pair-for-pair
  *     and value-for-value: the prefix filter prunes candidates, never
  *     results;
  *   - PRUNING on a heavy-tailed fixture — a viral element shared by every
  *     set plus rare per-set elements: the viral element is the COMMONEST,
  *     so it never enters any prefix, and the candidate set collapses from
  *     all-pairs to only the genuinely similar ones.
  */
class PrefixSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q151 equals q24's brute-force trigram Jaccard pair-for-pair") {
    def rows(q: String) = SparkEntry.queries(q)(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val pruned = rows("q151_prefix_sim_join")
    val brute = rows("q24_ngram_jaccard")
    assert(pruned == brute, "prefix filter lost or invented pairs vs q24")
    assert(pruned.nonEmpty, "fixture has no similar pairs at t=4/5")
  }

  test("q151 core prunes a viral element and stays exact on a heavy-tailed fixture") {
    import spark.implicits._
    // 40 sets: every one carries the viral element; sets 2k/2k+1 share
    // 4 of their 5 rare elements (o = 5 incl. viral, union = 7,
    // J = 5/7 ≥ 3/5); sets in different pair-groups share ONLY the viral
    // element (J = 1/11 << t). At t = 3/5 and m = 6 the prefix is 3
    // elements; the viral element's df (40) is the maximum, so it sorts
    // LAST and never enters any prefix — candidates via 'viral' would be
    // all C(40,2) = 780 pairs, the rare prefixes admit only the 20 true
    // pairs.
    val rows = (0 until 40).flatMap { i =>
      val grp = i / 2
      val variant = i % 2
      val rare = (0 until 5).map(j => s"rare_${grp}_${j + variant}")
      ("viral" +: rare).map(w => (i.toLong, w))
    }
    val out = graft.queries.Dedup.prefixSimJoin(rows.toDF("doc_id", "w"), 3, 5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = (0 until 40 by 2).map(i => (i.toLong, i + 1L)).toSet
    assert(out == expected, "heavy-tailed fixture: wrong pair set")
    val m = 6
    val p = m - (3 * m + 4) / 5 + 1
    assert(p == 3, s"prefix length drifted: $p")
  }
}
