package graft

import org.scalatest.funsuite.AnyFunSuite

/** q112 BPE merge application: the encode loop's contract — merge RANK
  * ORDER is honored (an earlier merge can consume a later merge's
  * operand), the greedy pass is left-to-right NON-OVERLAPPING, the fold
  * is idempotent on its own output, and encoding is lossless (symbols
  * concatenate back to the word). The last two run against the real
  * corpus vocabulary with the real learned merge list.
  */
class BpeApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  import queries.TextAnalysis.{encodeSyms, encodeWord, topMerges}

  private def chars(w: String): Array[String] = w.map(_.toString).toArray

  test("merge rank order is honored") {
    // rank 1 = (b,c) consumes the b that rank 2 = (a,b) would need
    assert(encodeWord("abc", Seq("bc", "ab")) === "a\u0001bc")
    // reversed ranks: (a,b) first, so (b,c) finds no single-char b left
    assert(encodeWord("abc", Seq("ab", "bc")) === "ab\u0001c")
  }

  test("greedy pass is left-to-right non-overlapping") {
    assert(encodeWord("aaaa", Seq("aa")) === "aa\u0001aa")
    assert(encodeWord("aaa", Seq("aa")) === "aa\u0001a")
    // fusing never splits: after (a,b) fuses, (b,c) cannot match the b
    // inside the multi-char symbol "ab"
    assert(encodeWord("abcb", Seq("ab", "bc")) === "ab\u0001c\u0001b")
  }

  test("fold is idempotent and lossless on the real vocabulary") {
    val merges = topMerges(spark, d, 8)
    assert(merges.size === 8)
    val words = SparkEntry.queries("q85_vocabulary")(spark, d)
      .select("w").collect().map(_.getString(0))
    assert(words.nonEmpty)
    for (w <- words) {
      val once = encodeSyms(chars(w), merges)
      val twice = encodeSyms(once, merges)
      assert(twice.toSeq === once.toSeq,
        s"re-applying the merge list changed '$w': ${once.mkString("|")} -> ${twice.mkString("|")}")
      assert(once.mkString("") === w, s"encoding lost characters of '$w'")
      assert(once.forall(_.nonEmpty), s"empty symbol in '$w'")
    }
  }
}
