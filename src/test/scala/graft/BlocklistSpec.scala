package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick

/** q261 contract — the automaton and its oracle discipline:
  *   (a) textbook semantics on the classic he/she/hers fixture:
  *       nested and overlapping matches all reported ("ushers" hits
  *       he, she, AND hers at the same ending position);
  *   (b) all-occurrences counting, overlapping included ("aa" in
  *       "aaaa" = 3) — the semantics a replace-based count CANNOT
  *       express, which is why (c) matters;
  *   (c) the registered patterns are all BORDERLESS (no proper prefix
  *       equals a suffix), the property that makes the automaton's
  *       count equal DuckDB's non-overlapping replace-count and hence
  *       makes the full hash oracle sound;
  *   (d) differential: automaton counts equal a naive
  *       sliding-substring scan over real corpus documents.
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("classic he/she/hers fixture: nested and overlapping outputs") {
    val ac = new AhoCorasick(IndexedSeq("he", "she", "hers"))
    val counts = ac.countAll("ushers")
    assert(counts.toSeq === Seq(1L, 1L, 1L),
      s"ushers must hit he, she, hers once each: ${counts.toSeq}")
    val c2 = ac.countAll("shehehers")
    // she@0; he@1 (inside she), he@3, he@6 (inside hers); hers@5
    assert(c2.toSeq === Seq(3L, 1L, 1L), s"nested-match counting wrong: ${c2.toSeq}")
  }

  test("overlapping occurrences are all counted") {
    val ac = new AhoCorasick(IndexedSeq("aa"))
    assert(ac.countAll("aaaa").head === 3L,
      "bordered pattern must count overlapping occurrences")
  }

  test("registered patterns are borderless — the oracle-soundness guard") {
    def hasBorder(p: String): Boolean =
      (1 until p.length).exists(k => p.take(k) == p.takeRight(k))
    queries.TextAnalysis.BlockPatterns.foreach { p =>
      assert(!hasBorder(p),
        s"pattern '$p' has a border — overlapping self-occurrences would " +
          "break the replace-count oracle")
    }
  }

  test("automaton counts equal a naive sliding scan over corpus documents") {
    def naiveCount(text: String, p: String): Long =
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    val pats = queries.TextAnalysis.BlockPatterns
    val ac = new AhoCorasick(pats)
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var totalHits = 0L
    docs.foreach { case (id, text) =>
      val got = ac.countAll(text)
      pats.indices.foreach { pi =>
        val want = naiveCount(text, pats(pi))
        assert(got(pi) === want,
          s"doc $id pattern '${pats(pi)}': automaton ${got(pi)} vs naive $want")
      }
      totalHits += got.sum
    }
    assert(totalHits > 0L, "fixture drift: no pattern matches anywhere")
  }
}
