package graft

import org.scalatest.funsuite.AnyFunSuite

/** q303 consensus contract: the verdict table is EXACTLY the union of
  * the two source pair tables — every lexical pair and every semantic
  * pair appears once, verdicts follow membership, and each score
  * column carries the source's own value (or −1 when that detector
  * didn't fire). Differential against the registered q23-artifact and
  * q26 queries themselves, so a drift in either source surfaces here
  * as a consensus mismatch.
  */
class DedupConsensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("q303 is the exact labeled union of the lexical and semantic pair tables") {
    val lex = SparkEntry.queries("q23_minhash_lsh_dedup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = SparkEntry.queries("q26_embedding_near_dup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = (lex.keySet ++ sem.keySet).map { k =>
      val verdict =
        if (lex.contains(k) && sem.contains(k)) "both"
        else if (lex.contains(k)) "lexical_only"
        else "semantic_only"
      k -> ((verdict, lex.getOrElse(k, -1.0), sem.getOrElse(k, -1.0)))
    }.toMap
    val got = SparkEntry.queries("q303_dedup_consensus")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected, s"consensus drifted:\n got $got\n exp $expected")
    assert(lex.nonEmpty && sem.nonEmpty,
      "fixture must exercise both detectors or the consensus is vacuous")
  }
}
