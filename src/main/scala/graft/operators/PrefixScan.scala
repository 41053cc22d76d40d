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

  val all: Seq[Q] = Seq(tokenBudget)
}
