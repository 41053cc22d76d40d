package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and sampling operators for a training-data pipeline:
  * deterministic train/val/test assignment and stratified subsampling.
  * Both are HASH-based, not random — at 100 TB a split must be (a) stable
  * across reruns and cluster sizes (no RNG seeds tied to partitioning),
  * (b) joinable later (any other table can recompute a doc's split from
  * its id alone), and (c) exactly reproducible by the oracle. The hash
  * family is the engine-portable seeded md5 (cf. `Dedup`).
  */
object Sampling {

  /** q79 — deterministic TRAIN/VAL/TEST split: a seeded md5 over the
    * doc id maps every document to a bucket in [0, 100); buckets split
    * 90/5/5. A pure narrow projection — no shuffle, no state, and any
    * downstream table can recompute the assignment from the id alone
    * (the property that makes leakage audits possible: membership is a
    * function, not a stored fact).
    */
  /** DuckDB split-bucket expression for a given doc-id SQL expression —
    * shared by q79's oracle and q86's (the manifest stamps exactly q79's
    * assignment, so the hash formula may exist once per engine).
    */
  private[graft] def sqlSplitBucket(idExpr: String): String =
    s"('0x' || substr(md5(concat('split|', $idExpr)), 1, 15))::BIGINT % 100"

  private[graft] def sqlSplitCase(idExpr: String): String =
    s"""CASE WHEN ${sqlSplitBucket(idExpr)} < 90 THEN 'train'
             WHEN ${sqlSplitBucket(idExpr)} < 95 THEN 'val'
             ELSE 'test' END"""

  val trainSplit = Q(
    "q79_train_split",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(CAST(concat('split|', doc_id) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 100")
            .as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test").as("split")),
    Some(s"""SELECT doc_id,
                   ${sqlSplitBucket("doc_id")} AS bucket,
                   ${sqlSplitCase("doc_id")} AS split
            FROM documents""")
  )

  /** q80 — STRATIFIED deterministic subsample: the hash-smallest 50
    * documents per language — the "sample K per stratum" operator behind
    * domain-mixing a training corpus (equal representation regardless of
    * stratum size). Hash-ranking makes the sample deterministic and
    * rerun-stable where reservoir sampling is not; one shuffle on the
    * stratum key, and the window's rank cutoff keeps K bounded per
    * stratum. (At extreme stratum cardinality the same shape runs as the
    * bounded TopK aggregator, q60's pattern, shuffling K rows per task
    * instead of the stratum.)
    */
  val stratifiedSample = Q(
    "q80_stratified_sample",
    (s, d) => {
      val ranked = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFns.md5Hex(concat(lit("sample|"), col("doc_id"))).as("h"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy("lang").orderBy(col("h"), col("doc_id")))
            .cast("long"))
      ranked.where(col("rnk") <= 50)
        .select(col("doc_id"), col("lang"), col("rnk"))
    },
    Some("""SELECT doc_id, lang, rnk FROM (
              SELECT doc_id, lang,
                     CAST(row_number() OVER (PARTITION BY lang
                            ORDER BY md5(concat('sample|', doc_id)), doc_id) AS BIGINT)
                       AS rnk
              FROM documents) t
            WHERE rnk <= 50""")
  )

  /** q94 — TEMPERATURE-BASED DOMAIN MIXING: per-language sampling quotas
    * proportional to `sqrt(n_l)` (temperature α = 0.5 in the standard
    * `p_l ∝ n_l^α` multilingual-mixing family) — big languages get
    * down-weighted relative to their raw share, small ones up-weighted,
    * which is how multilingual training corpora rebalance domains. The
    * quota is a per-stratum function (`3·⌊√n_l⌋`, no cross-stratum
    * normalization), deliberately: `sqrt` is IEEE-exact in both engines
    * where a `pow(x, 0.7)`-shaped weight or a cross-stratum sum would
    * admit last-bit divergence that could flip a floor() at the quota
    * boundary (the round() portability hazard, BASELINE gotcha). Selection
    * is q80's hash-smallest ranking against the data-dependent quota:
    * deterministic, rerun-stable, one shuffle on the stratum key. At
    * 100 TB the count aggregation is map-side-combined and the tiny
    * per-language quota table broadcasts.
    */
  val temperatureMix = Q(
    "q94_temperature_mix",
    (s, d) => {
      // NULL lang coalesced to 'unknown' (as q95 does): an equi-join on a
      // raw nullable lang would silently drop null-language documents
      // from the mix on both engines
      val docs = Tables.documents(s, d)
        .withColumn("lang", coalesce(col("lang"), lit("unknown")))
      val quotas = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_l"))
        .withColumn("quota", floor(sqrt(col("n_l"))).cast("long") * 3)
      val ranked = docs
        .select(col("doc_id"), col("lang"),
          TextFns.md5Hex(concat(lit("mix|"), col("doc_id"))).as("h"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy("lang").orderBy(col("h"), col("doc_id")))
            .cast("long"))
      ranked.join(quotas, Seq("lang"))
        .where(col("rnk") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("n_l"), col("quota"), col("rnk"))
    },
    Some("""WITH d AS (SELECT doc_id, coalesce(lang, 'unknown') AS lang FROM documents),
            c AS (SELECT lang, count(*) AS n_l FROM d GROUP BY lang),
            r AS (SELECT doc_id, lang,
                         CAST(row_number() OVER (PARTITION BY lang
                                ORDER BY md5(concat('mix|', doc_id)), doc_id) AS BIGINT)
                           AS rnk
                  FROM d)
            SELECT r.doc_id, r.lang, CAST(c.n_l AS BIGINT) AS n_l,
                   CAST(floor(sqrt(c.n_l)) AS BIGINT) * 3 AS quota, r.rnk
            FROM r JOIN c USING (lang)
            WHERE r.rnk <= CAST(floor(sqrt(c.n_l)) AS BIGINT) * 3""")
  )

  val all: Seq[Q] = Seq(trainSplit, stratifiedSample, temperatureMix)
}
