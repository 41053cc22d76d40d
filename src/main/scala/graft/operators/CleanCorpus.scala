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

  /** q123 — URL CANONICALIZATION + crawl-level URL dedup: normalize each
    * document's source URL (lowercase scheme/host, strip `www.`, strip
    * default ports `:80`/`:443`, drop the fragment, remove `utm_*`
    * tracking parameters, strip the trailing slash) and group documents
    * by canonical URL — the FIRST dedup a crawl pipeline runs, before
    * any content hashing: the same page arrives under dozens of raw URL
    * spellings, and canonical-URL grouping removes that class for the
    * cost of a string transform (content dedup, q22, then only sees one
    * copy per page). Raw URLs are synthesized in closed form from
    * doc_id (three spelling variants exercising every normalization
    * rule; the corpus carries no URL column), so the oracle sees
    * byte-identical inputs — the q93 dirty-text reconstruction move.
    *
    * Scale shape: canonicalization is a pure narrow projection (regex
    * chain inside whole-stage codegen, zero shuffle); the dedup group
    * is ONE map-side-combined aggregation on the canonical string and a
    * join back (AQE-decided, no hint — the group table is
    * corpus-growing). Keeper rule is min-doc_id (q22/q89 discipline).
    * Regexes avoid escape-sequence divergence by spelling the literal
    * dot as `[.]` (Spark SQL string literals process backslashes,
    * DuckDB's do not — the char class sidesteps the whole hazard).
    */
  /** Spark-side raw-URL synthesis + canonicalization expressions, shared
    * by q123 and the q200 pipeline audit (one definition per rule set).
    */
  private[operators] val sparkRawUrl =
    """CASE WHEN doc_id % 3 = 0 THEN
           concat('HTTP://WWW.Site', CAST(doc_id % 4 AS STRING),
                  '.Example.COM:80/p/', CAST(doc_id % 5 AS STRING),
                  '/?utm_source=rss&utm_id=', CAST(doc_id AS STRING), '#top')
         WHEN doc_id % 3 = 1 THEN
           concat('https://www.site', CAST(doc_id % 4 AS STRING),
                  '.example.com:443/p/', CAST(doc_id % 5 AS STRING),
                  '?utm_campaign=c', CAST(doc_id AS STRING))
         ELSE
           concat('https://site', CAST(doc_id % 4 AS STRING),
                  '.example.com/p/', CAST(doc_id % 5 AS STRING)) END"""

  private[operators] val sparkCanonUrl =
    """concat(
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)), '://',
         regexp_replace(regexp_replace(
           lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
           '^www[.]', ''), ':(80|443)$', ''),
         regexp_replace(regexp_replace(regexp_replace(
           regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1),
           'utm_[a-z]+=[^&#]*&', ''), '[?&]utm_[a-z]+=[^&#]*', ''),
           '/$', ''))"""

  /** DuckDB twins of the two fragments above (same rules, 'g' flags). */
  private[operators] val sqlRawUrl =
    """CASE WHEN doc_id % 3 = 0 THEN
             'HTTP://WWW.Site' || (doc_id % 4) ||
             '.Example.COM:80/p/' || (doc_id % 5) ||
             '/?utm_source=rss&utm_id=' || doc_id || '#top'
           WHEN doc_id % 3 = 1 THEN
             'https://www.site' || (doc_id % 4) ||
             '.example.com:443/p/' || (doc_id % 5) ||
             '?utm_campaign=c' || doc_id
           ELSE
             'https://site' || (doc_id % 4) ||
             '.example.com/p/' || (doc_id % 5) END"""

  private[operators] val sqlCanonUrl =
    """lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
       regexp_replace(regexp_replace(
         lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
         '^www[.]', '', 'g'), ':(80|443)$', '', 'g') ||
       regexp_replace(regexp_replace(regexp_replace(
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1),
         'utm_[a-z]+=[^&#]*&', '', 'g'), '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
         '/$', '', 'g')"""

  val urlCanon = Q(
    "q123_url_canon",
    (s, d) => {
      val raw = Tables.documents(s, d)
        .select(col("doc_id"), expr(sparkRawUrl).as("url"))
      val canon = raw.withColumn("canon", expr(sparkCanonUrl))
      val groups = canon.groupBy("canon")
        .agg(min("doc_id").as("canon_keeper"), count(lit(1)).as("n_same"))
      canon.join(groups, Seq("canon"))
        .select(col("doc_id"), col("url"), col("canon"),
          col("canon_keeper"), col("n_same"))
    },
    Some(s"""WITH raw AS (
              SELECT doc_id, $sqlRawUrl AS url
              FROM documents),
            c AS (
              SELECT doc_id, url, $sqlCanonUrl AS canon
              FROM raw),
            g AS (SELECT canon, min(doc_id) AS canon_keeper,
                         CAST(count(*) AS BIGINT) AS n_same
                  FROM c GROUP BY canon)
            SELECT c.doc_id, c.url, c.canon, g.canon_keeper, g.n_same
            FROM c JOIN g USING (canon)""")
  )

  /** q200 — PIPELINE AUDIT, the capstone composition WITH TELEMETRY:
    * the full crawl-to-corpus funnel — URL-canonical dedup (q123's
    * rules) → exact content dedup (q22/q52's fingerprint rule) →
    * quality gate (q52's) → decontamination + benchmark holdout
    * (q86's) — built as ONE LINEAR observed chain, with a q194
    * `Observation` at every stage boundary counting surviving rows and
    * tokens. The registered result is the FUNNEL TABLE (stage,
    * rows_after, tokens_after): the five-row artifact a data-curation
    * dashboard plots per corpus drop, answering "where did my tokens
    * go" without one extra scan — every counter rides the pipeline's
    * own pass (q194's AggregatingAccumulator mechanics, five deep).
    *
    * Plan shape, and why the dedup stages are WINDOWS here while
    * q123/q52 use groupBy+semi-join for the same rule: a semi join
    * consumes its probe subtree TWICE (keeper derivation + probe) — in
    * an observed chain that would double-fire every upstream
    * CollectMetrics (and double-read the scan); `min(doc_id) OVER
    * (PARTITION BY key)` keeps the chain linear — one scan, one
    * CollectMetrics per stage, one shuffle per dedup key, and the
    * canon/fp groups are bounded-small (≤ crawl duplication factor), so
    * the window carries no hot-key risk (the q48 concern). The
    * decontamination side input derives independently (q86's
    * contaminated set — tiny, AQE broadcasts the anti join). At 100 TB
    * this exact topology is the nightly corpus build; the funnel row
    * for stage k is the acceptance test for stage k's config change.
    */
  val pipelineAudit = Q(
    "q200_pipeline_audit",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val stages = Seq("0_raw", "1_url_canon", "2_exact_dedup", "3_quality", "4_decontam")
      val obs = stages.map(n =>
        n -> org.apache.spark.sql.Observation(s"audit_$n")).toMap
      def metered(df: DataFrame, stage: String): DataFrame =
        df.observe(obs(stage),
          count(lit(1)).as("rows"),
          sum(col("n_tokens")).as("toks"))
      val base = Tables.documents(s, d).select(
        col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
        (expr("CAST(size(filter(split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)")
          / size(TextFns.tokens(col("text")))).as("stop_ratio"),
        expr(sparkRawUrl).as("url"),
        TextFns.md5Hex(col("text")).as("fp"))
        .withColumn("canon", expr(sparkCanonUrl))
      val s1 = metered(metered(base, "0_raw")
        .withColumn("k1", min("doc_id").over(Window.partitionBy("canon")))
        .where(col("doc_id") === col("k1")), "1_url_canon")
      val s2 = metered(s1
        .withColumn("k2", min("doc_id").over(Window.partitionBy("fp")))
        .where(col("doc_id") === col("k2")), "2_exact_dedup")
      val s3 = metered(s2.where(expr(SqlQualityGate)), "3_quality")
      val contaminated = _root_.graft.queries.TextAnalysis.decontaminate.fn(s, d)
        .select(col("train_doc").as("doc_id")).distinct()
      val s4 = metered(s3.where(col("doc_id") % 101 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti"), "4_decontam")
      s4.write.format("noop").mode("overwrite").save()
      stages.map { n =>
        val m = obs(n).get
        (n, m("rows").asInstanceOf[Long], m("toks").asInstanceOf[Long])
      }.toDF("stage", "rows_after", "tokens_after")
    },
    Some(s"""WITH base AS (
              SELECT doc_id,
                     len(string_split(text, ' ')) AS n_tokens,
                     CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS stop_ratio,
                     $sqlRawUrl AS url,
                     md5(text) AS fp,
                     text
              FROM documents),
            basec AS (SELECT *, $sqlCanonUrl AS canon FROM base),
            s1 AS (SELECT * FROM (
                     SELECT *, min(doc_id) OVER (PARTITION BY canon) AS k1 FROM basec)
                   WHERE doc_id = k1),
            s2 AS (SELECT * FROM (
                     SELECT *, min(doc_id) OVER (PARTITION BY fp) AS k2 FROM s1)
                   WHERE doc_id = k2),
            s3 AS (SELECT * FROM s2 WHERE $SqlQualityGate),
            ${_root_.graft.queries.TextAnalysis.sqlG5Ctes},
            contaminated AS (
              SELECT DISTINCT t.doc_id
              FROM g5 t JOIN g5 b ON b.g = t.g AND b.doc_id % 101 = 0
              WHERE t.doc_id % 101 <> 0),
            s4 AS (SELECT * FROM s3
                   WHERE doc_id % 101 <> 0
                     AND doc_id NOT IN (SELECT doc_id FROM contaminated))
            SELECT '0_raw' AS stage, count(*) AS rows_after,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens_after FROM basec
            UNION ALL SELECT '1_url_canon', count(*), CAST(sum(n_tokens) AS BIGINT) FROM s1
            UNION ALL SELECT '2_exact_dedup', count(*), CAST(sum(n_tokens) AS BIGINT) FROM s2
            UNION ALL SELECT '3_quality', count(*), CAST(sum(n_tokens) AS BIGINT) FROM s3
            UNION ALL SELECT '4_decontam', count(*), CAST(sum(n_tokens) AS BIGINT) FROM s4""")
  )

  val all: Seq[Q] = Seq(cleanCorpus, trainingManifest, urlCanon, pipelineAudit)
}
