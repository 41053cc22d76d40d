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

  /** The quality gate, ONE definition for both engines' SQL (q52 + q86). */
  private val SqlQualityGate = "n_tokens >= 20 AND stop_ratio < 0.3"

  /** DuckDB CTEs producing `scored` + `keepers` — shared by q52's oracle
    * and q86's (the manifest keeps exactly q52's survivors, so the
    * scoring and keeper selection may exist once).
    */
  private val sqlScoredKeepers =
    """scored AS (
         SELECT doc_id, lang, md5(text) AS fp,
                len(string_split(text, ' ')) AS n_tokens,
                CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
                  / len(string_split(text, ' ')) AS stop_ratio
         FROM documents),
       keepers AS (SELECT min(doc_id) AS doc_id FROM scored GROUP BY fp)"""

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
    Some(s"""WITH $sqlScoredKeepers
            SELECT doc_id, lang, n_tokens, stop_ratio
            FROM scored
            WHERE doc_id IN (SELECT doc_id FROM keepers)
              AND $SqlQualityGate""")
  )

  /** q86 — the TRAINING MANIFEST, the capstone composition: q52's
    * cleaned corpus (exact-dedup keepers above the quality gate), minus
    * every decontaminated document (any q82 benchmark 5-gram overlap)
    * and the benchmark subset itself, each surviving doc stamped with
    * its q79 train/val/test split — the (doc, lang, tokens, split) list
    * a data loader actually consumes. This is the proof the operators
    * COMPOSE: registered queries are reused as the pipeline stages
    * (the reference's multi-round chaining idiom, SURVEY §2b).
    *
    * Plan shape at 100 TB: clean-corpus semi join as in q52; the
    * contaminated-id set is tiny (anti join, AQE broadcasts it); the
    * split column is a row-local hash — no extra shuffle beyond q52's.
    */
  val trainingManifest = Q(
    "q86_training_manifest",
    (s, d) => {
      val clean = cleanCorpus.fn(s, d).select("doc_id", "lang", "n_tokens")
      val contaminated = _root_.graft.queries.TextAnalysis.decontaminate.fn(s, d)
        .select(col("train_doc").as("doc_id")).distinct()
      val split = _root_.graft.queries.Sampling.trainSplit.fn(s, d)
        .select("doc_id", "split")
      clean
        .where(col("doc_id") % 101 =!= 0) // the benchmark subset never trains
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(split, Seq("doc_id"))
        .select("doc_id", "lang", "n_tokens", "split")
    },
    Some(s"""WITH $sqlScoredKeepers,
            clean AS (
              SELECT doc_id, lang, n_tokens
              FROM scored
              WHERE doc_id IN (SELECT doc_id FROM keepers)
                AND $SqlQualityGate),
            ${_root_.graft.queries.TextAnalysis.sqlG5Ctes},
            contaminated AS (
              SELECT DISTINCT t.doc_id
              FROM g5 t JOIN g5 b ON b.g = t.g AND b.doc_id % 101 = 0
              WHERE t.doc_id % 101 <> 0)
            SELECT c.doc_id, c.lang, c.n_tokens,
                   ${_root_.graft.queries.Sampling.sqlSplitCase("c.doc_id")} AS split
            FROM clean c
            WHERE c.doc_id % 101 <> 0
              AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)""")
  )

  val all: Seq[Q] = Seq(cleanCorpus, trainingManifest)
}
