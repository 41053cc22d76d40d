package graft.operators

import graft.{Q, Tables}
import graft.queries.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GLOBAL PREFIX-SUM (distributed scan) + the token-budget selection it
  * enables.
  *
  * A training-data curation run rarely wants "the whole corpus" — it wants
  * "the BEST documents until the token budget is full" (the data-mixing /
  * Chinchilla-style budget cut every pretraining pipeline ends with). The
  * selection rule is a running total in quality order: keep documents,
  * best first, while the cumulative token count stays under the budget.
  *
  * A `sum(tokens) OVER (ORDER BY quality DESC)` with no partition key is
  * the same scale anti-pattern [[GlobalOrder]] (q98) documents for
  * `row_number`: one window partition = the whole corpus on one task. The
  * scalable shape is the classic two-phase distributed scan:
  *
  *   1. range-repartition by the sort key (Spark's distributed-sort
  *      machinery: sampled boundaries, locally sorted partitions — the
  *      concatenation IS the total order);
  *   2. one lightweight job collects PER-PARTITION VALUE TOTALS —
  *      O(partitions) driver state, never O(rows);
  *   3. each partition adds its exclusive offset to a local running sum —
  *      no further shuffle, one pass.
  *
  * q98 enumerates positions (the scan of the constant 1); this operator
  * scans an arbitrary Long measure — together they are the two primitives
  * every "global order + global accumulation" pipeline needs. Like q98,
  * the scan itself is genuinely per-partition imperative logic, so it is
  * one of the few RDD-backed operators (SURVEY §2c "RDD only where
  * Catalyst can't express it").
  *
  * The total corpus token mass falls out of step 2 for free, so the
  * budget (here: half the corpus) costs no extra job. Token counts are
  * integers, the cumulative sum is exact, and the q31 quality doubles are
  * bit-portable by q31's own contract — hence a FULL hash oracle against
  * DuckDB's window form.
  */
object PrefixScan {

  /** Exclusive-offset cumulative sum of `valueCol` in (sortCol…) order.
    * Returns (the input columns) + `cum` = running total INCLUDING the
    * current row, plus the grand total (needed by callers that budget
    * against the whole mass) — computed from the same O(partitions)
    * collect that builds the offsets, never a second scan.
    */
  private[graft] def cumSum(
      s: SparkSession,
      df: DataFrame): (DataFrame, Long) = {
    import s.implicits._
    // column order pinned: (doc_id, n_tokens, quality)
    val sorted = df
      .repartitionByRange(col("quality").desc, col("doc_id"))
      .sortWithinPartitions(col("quality").desc, col("doc_id"))
      .as[(Long, Long, Double)]
    val rdd = sorted.rdd
    rdd.cache()
    val partTotals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var t = 0L
        it.foreach(t += _._2)
        Iterator((i, t))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val total = offsets.last
    val bc = s.sparkContext.broadcast(offsets)
    val cum = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { case (id, tok, q) => run += tok; (id, tok, q, run) }
    }
    (s.createDataset(cum).toDF("doc_id", "n_tokens", "quality", "cum_tokens"),
      total)
  }

  val tokenBudget = Q(
    "q153_token_budget",
    (s, d) => {
      val scored = TextAnalysis.qualityScore.fn(s, d)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
      val (cum, total) = cumSum(s, scored)
      cum.where(col("cum_tokens") <= lit(total / 2))
    },
    Some(s"""WITH q AS (${TextAnalysis.qualityScore.oracle.get}),
             c AS (SELECT doc_id, n_tokens, quality,
                          sum(n_tokens) OVER (ORDER BY quality DESC, doc_id)
                            AS cum_tokens
                   FROM q),
             t AS (SELECT sum(n_tokens) AS total FROM q)
             SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
                    CAST(cum_tokens AS BIGINT) AS cum_tokens
             FROM c, t WHERE cum_tokens <= total // 2""")
  )

  private val EcdfBins = 20

  /** q160 — GLOBAL EQUI-DEPTH (ECDF) BINNING: map every document's q31
    * quality score to a percentile bin 0..19 — the rank-normalization a
    * feature pipeline applies before mixing heterogeneous quality
    * signals (raw scores from different scorers are incomparable; their
    * ECDF positions are). A global `ntile`/`percent_rank` window is the
    * q98/q153 anti-pattern (whole corpus, one window partition); the
    * scalable shape selects the B−1 BIN EDGES — the rows at global
    * positions ⌈k·n/B⌉, found with the same range-repartition +
    * zipWithIndex enumeration as q98 — and joins the bounded edge list
    * back map-side: the corpus-sized path never sorts globally, and the
    * driver state is B−1 rows (the ivfCents bounded-collect precedent).
    * A document's bin is the count of edges lexicographically below its
    * (quality, doc_id) — edge ties broken by id, so the assignment is
    * total and engine-portable; with distinct sort keys bin sizes differ
    * by at most one (`EcdfBinSpec` proves equi-depth directly). Integer
    * bin + q31's bit-portable doubles ⇒ full hash oracle (the oracle
    * computes the same edges from a window rank — tiny at oracle scale).
    */
  val ecdfBins = Q(
    "q160_ecdf_bins",
    (s, d) => {
      import s.implicits._
      val scored = TextAnalysis.qualityScore.fn(s, d)
        .select(col("doc_id"), col("quality"))
      val sorted = scored
        .select(col("quality"), col("doc_id"))
        .repartitionByRange(col("quality"), col("doc_id"))
        .sortWithinPartitions(col("quality"), col("doc_id"))
        .as[(Double, Long)]
      val indexed = sorted.rdd.zipWithIndex()
      val n = indexed.count()
      val positions = (1 until EcdfBins).map(k =>
        (k.toLong * n + EcdfBins - 1) / EcdfBins - 1).toSet // 0-based
      val edges = indexed.filter(t => positions.contains(t._2))
        .map(_._1).collect().sortBy(identity)
      val edgeCol = array(edges.map { case (q, id) =>
        struct(lit(q).as("eq"), lit(id).as("eid"))
      }.toIndexedSeq: _*)
      scored.withColumn("edges", edgeCol)
        .select(col("doc_id"), col("quality"),
          expr("""CAST(size(filter(edges, e ->
                  e.eq < quality OR (e.eq = quality AND e.eid < doc_id)))
                  AS BIGINT)""").as("bin"))
    },
    Some(s"""WITH q AS (${TextAnalysis.qualityScore.oracle.get}),
             nn AS (SELECT count(*) AS n FROM q),
             r AS (SELECT doc_id, quality,
                          row_number() OVER (ORDER BY quality, doc_id) AS pos
                   FROM q),
             edges AS (SELECT r.quality AS eq, r.doc_id AS eid
                       FROM r, nn
                       WHERE r.pos IN (SELECT (k * nn.n + ${EcdfBins - 1}) // $EcdfBins
                                       FROM generate_series(1, ${EcdfBins - 1}) g(k), nn))
             SELECT q.doc_id, q.quality,
                    CAST((SELECT count(*) FROM edges e
                          WHERE e.eq < q.quality
                             OR (e.eq = q.quality AND e.eid < q.doc_id))
                         AS BIGINT) AS bin
             FROM q""")
  )

  val all: Seq[Q] = Seq(tokenBudget, ecdfBins)
}
