package graft.functions

/** Classic Aho–Corasick dictionary automaton (Aho & Corasick, CACM 1975
  * — public-domain algorithm, implemented from the paper's description):
  * matches EVERY occurrence of every pattern in one left-to-right pass
  * over the text, O(len + matches), independent of pattern count.
  *
  * Why it exists here (q261): a blocklist/PII/compliance screen matches
  * hundreds of phrases against every document. The naive plan — one
  * `contains`/`regexp_count` column per phrase — scans each document
  * once PER PATTERN (100 patterns = 100× the corpus pass) or compiles
  * an alternation regex whose NFA backtracks. The automaton is built
  * once on the driver (size = total pattern chars), broadcast, and each
  * partition streams its documents through it exactly once — the
  * per-row cost a 100 TB screen can actually pay.
  *
  * Construction: goto trie over pattern chars, BFS failure links
  * (deepest proper suffix that is a trie node), outputs merged through
  * failure links at build time (BFS order guarantees fail(v) is
  * finalized before v), so the scan reports nested/overlapping matches
  * (pattern-in-pattern included) without walking the fail chain per
  * position.
  */
final class AhoCorasick(val patterns: IndexedSeq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")

  private val gotos =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
  private val out =
    scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { c =>
      s = gotos(s).getOrElseUpdate(c, {
        gotos += scala.collection.mutable.HashMap.empty[Char, Int]
        out += Nil
        gotos.length - 1
      })
    }
    out(s) = pi :: out(s)
  }

  private val fail = new Array[Int](gotos.length)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotos(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotos(u).foreach { case (c, v) =>
        queue += v
        var f = fail(u)
        while (f > 0 && !gotos(f).contains(c)) f = fail(f)
        val cand = gotos(f).getOrElse(c, 0)
        fail(v) = if (cand == v) 0 else cand
        // merge suffix outputs once, at build time
        out(v) = out(v) ::: out(fail(v))
      }
    }
  }

  /** Number of occurrences of each pattern in `text` (ALL occurrences,
    * overlapping included), indexed like `patterns`.
    */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s > 0 && !gotos(s).contains(c)) s = fail(s)
      s = gotos(s).getOrElse(c, 0)
      var o = out(s)
      while (o.nonEmpty) {
        counts(o.head) += 1
        o = o.tail
      }
      i += 1
    }
    counts
  }
}
