package graft

import org.scalatest.funsuite.AnyFunSuite

/** q116 LM quality scoring: the discrimination property a quality
  * filter exists for — documents made of bigrams the reference LM has
  * seen score strictly better (higher avg log-prob, lower perplexity)
  * than documents of never-seen bigrams over the same vocabulary.
  */
class LmQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q116: seen-bigram docs outscore unseen-bigram docs under the reference LM") {
    import spark.implicits._
    // reference docs (id % 11 == 0) repeat a fixed phrase, so its
    // bigrams are high-count; doc 1 reuses them verbatim, doc 2 uses
    // the SAME vocabulary in an order the LM never saw
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (0L, (phrase + " ") * 5 + phrase),
      (11L, (phrase + " ") * 3 + phrase),
      (22L, (phrase + " ") * 4 + phrase),
      (1L, phrase),
      (2L, "dog lazy the over jumps fox brown quick the")
    ).toDF("doc_id", "text")
    val scored = queries.TextAnalysis.lmScore(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_lp"), r.getAs[Double]("ppl"))).toMap
    val (seenLp, seenPpl) = scored(1L)
    val (unseenLp, unseenPpl) = scored(2L)
    info(f"seen: avg_lp=$seenLp%.4f ppl=$seenPpl%.1f  unseen: avg_lp=$unseenLp%.4f ppl=$unseenPpl%.1f")
    assert(seenLp > unseenLp, "seen bigrams must have higher avg log-prob")
    assert(seenPpl < unseenPpl, "seen bigrams must have lower perplexity")
    // totality: a one-word doc gets defined zeros
    val one = queries.TextAnalysis.lmScore(Seq((3L, "word")).toDF("doc_id", "text"))
      .collect().head
    assert(one.getAs[Long]("n_bigrams") === 0L)
    assert(one.getAs[Double]("ppl") === 0.0)
  }
}
