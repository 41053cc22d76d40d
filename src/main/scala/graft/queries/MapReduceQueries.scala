package graft.queries

import graft.{Q, Tables}
import graft.mr.MapReduce

/** Queries driven through the typed MapReduce façade (graft.mr.MapReduce)
  * rather than the DataFrame DSL — proving the reference's exact client
  * contract (map = flatMap with 0..n emissions, reduce = whole-group fold)
  * runs distributed on Spark and still matches a SQL oracle.
  */
object MapReduceQueries {

  /** q20 — word count via the façade: the canonical MapReduce program
    * (Dean & Ghemawat §2.1) expressed exactly as a reference client would:
    * map splits a document into (word, 1) emissions; reduce sums one whole
    * key-group. Arrives at Spark as flatMap → groupByKey → flatMapGroups.
    */
  val wordCount = Q(
    "q20_mr_wordcount",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select("doc_id", "text").as[(Long, String)]
      MapReduce.run[Long, String, String, Long, String, Long](
        docs,
        map = (_, text) =>
          text.split(' ').iterator.filter(_.nonEmpty).map(w => (w, 1L)),
        reduce = (word, group) => Iterator((word, group.map(_._2).sum))
      ).toDF("word", "cnt")
    },
    Some("""SELECT word, count(*) AS cnt FROM (
              SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
            WHERE word <> '' GROUP BY word""")
  )

  /** q21 — grouped character histogram via the façade: the reference's own
    * sample client (SampleClient.cpp:32-66) generalized to per-language
    * counts, with a composite key (lang, char) to show non-trivial K2.
    */
  val charByLang = Q(
    "q21_mr_char_by_lang",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select("lang", "text").as[(String, String)]
      MapReduce.run[String, String, (String, String), Long, (String, String), Long](
        docs,
        map = (lang, text) => text.iterator.map(ch => ((lang, ch.toString), 1L)),
        reduce = (key, group) => Iterator((key, group.map(_._2).sum))
      ).map { case ((lang, c), n) => (lang, c, n) }
        .toDF("lang", "c", "cnt")
    },
    Some("""SELECT lang, c, count(*) AS cnt FROM (
              SELECT lang, unnest(string_split(text, '')) AS c FROM documents) t
            GROUP BY lang, c""")
  )

  /** q59 — word count through the combiner path (runCombine): identical
    * semantics to q20 (same oracle) but the plan carries one record per
    * (task, word) across the shuffle instead of one per emission —
    * reduceGroups compiles to partial+final aggregation.
    */
  val wordCountCombine = Q(
    "q59_mr_wordcount_combine",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select("doc_id", "text").as[(Long, String)]
      MapReduce.runCombine[Long, String, String, Long](
        docs,
        map = (_, text) =>
          text.split(' ').iterator.filter(_.nonEmpty).map(w => (w, 1L)),
        combine = _ + _
      ).toDF("word", "cnt")
    },
    wordCount.oracle
  )

  val all: Seq[Q] = Seq(wordCount, charByLang, wordCountCombine)
}
