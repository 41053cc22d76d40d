package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composition the
  * individual operators exist for: exact-dedup keeper selection →
  * quality gate → per-document token accounting, producing the corpus a
  * tokenizer would consume.
  *
  * Plan shape at 100 TB: one narrow pass computes fingerprint + quality +
  * token stats per document (no shuffle), one shuffle on the 32-char
  * fingerprint picks dedup keepers, and a semi join (broadcast-able when
  * the keeper set is small relative to the corpus, else shuffled) keeps
  * surviving rows. Document bodies are never shuffled.
  */
object CleanCorpus {

  /** q52 — cleaned corpus: per surviving document (dedup keeper AND
    * quality above threshold), its language, token count, and quality.
    */
  val cleanCorpus = Q(
    "q52_clean_corpus",
    (s, d) => {
      val scored: DataFrame = Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          TextFns.md5Hex(col("text")).as("fp"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
          (expr("CAST(size(filter(split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)")
            / size(TextFns.tokens(col("text")))).as("stop_ratio"))
      val keepers = scored
        .groupBy("fp")
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      scored
        .join(keepers, Seq("doc_id"), "left_semi")
        .where(col("n_tokens") >= 20 && col("stop_ratio") < 0.3)
        .select("doc_id", "lang", "n_tokens", "stop_ratio")
    },
    Some("""WITH scored AS (
              SELECT doc_id, lang, md5(text) AS fp,
                     len(string_split(text, ' ')) AS n_tokens,
                     CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS stop_ratio
              FROM documents),
            keepers AS (SELECT min(doc_id) AS doc_id FROM scored GROUP BY fp)
            SELECT doc_id, lang, n_tokens, stop_ratio
            FROM scored
            WHERE doc_id IN (SELECT doc_id FROM keepers)
              AND n_tokens >= 20 AND stop_ratio < 0.3""")
  )

  val all: Seq[Q] = Seq(cleanCorpus)
}
