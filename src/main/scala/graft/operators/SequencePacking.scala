package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style SEQUENCE PACKING: training pipelines concatenate documents in
  * a deterministic order and cut the token stream every `capacity` tokens;
  * a document's placement is fully determined by the running token count
  * before it. This operator assigns every document its start offset, its
  * training-sequence id (bin), and its offset within that sequence.
  *
  * Spark-first shape: packing is per-shard (here: per language — the
  * natural training-bucket key) so the running sum is a plain windowed
  * cumulative sum partitioned by shard — fully distributed, no global
  * single-partition bottleneck. The window shuffles once on (lang) and
  * sorts by doc_id within; at 100 TB the shard key would be finer
  * (lang × hash-bucket), which changes nothing structurally.
  *
  * All outputs are integer arithmetic over token counts — bit-exact in
  * any engine, so the oracle is a plain SQL window.
  */
object SequencePacking {

  private val Capacity = 2048L

  val packing = Q(
    "q71_sequence_packing",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(filter(split(col("text"), " "), t => t =!= ""))
            .cast("long").as("n_tokens"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("start_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("start_offset"),
          (col("start_offset") / Capacity).cast("long").as("seq_id"),
          (col("start_offset") % Capacity).as("seq_offset"))
    },
    Some(s"""WITH toks AS (
               SELECT doc_id, lang,
                      CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                           AS BIGINT) AS n_tokens
               FROM documents)
             SELECT doc_id, lang, n_tokens,
                    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS start_offset,
                    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         // $Capacity AS BIGINT) AS seq_id,
                    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         % $Capacity AS BIGINT) AS seq_offset
             FROM toks""")
  )

  private val BinCapacity = 256L

  /** q95 — NEXT-FIT-DECREASING BIN PACKING, the no-document-split variant
    * of q71: q71 cuts the concatenated stream mid-document every
    * `capacity` tokens; here each document lands whole in a training
    * sequence (bin), documents are placed longest-first (decreasing
    * order tightens packing — classic NFD), and a bin closes the moment
    * the next document doesn't fit. The assignment is inherently
    * SEQUENTIAL within a shard — each placement depends on the running
    * fill — so this is the one operator family where a typed
    * per-group loop (`flatMapGroups`) is the honest Spark shape, not a
    * window: no SQL window computes a running sum WITH RESETS. The
    * shard key (lang × doc_id mod 4) bounds every group; at 100 TB the
    * modulus grows with the corpus so a shard always fits an executor,
    * and shards pack in parallel — one shuffle total. The oracle walks
    * the same recurrence as a recursive CTE, one rank-step per
    * iteration across all shards in parallel.
    */
  val binPacking = Q(
    "q95_bin_packing",
    (s, d) => {
      import s.implicits._
      // coalesce the shard key on BOTH sides: a NULL lang would group as
      // a (null, sub) tuple key here but collapse to one NULL shard
      // under the oracle's NULL-propagating || — a latent cross-engine
      // divergence (same class as the round-3 NaN-ordering catch)
      val toks = Tables.documents(s, d)
        .select(coalesce(col("lang"), lit("unknown")).as("lang"),
          (col("doc_id") % 4).as("sub"), col("doc_id"),
          size(filter(split(col("text"), " "), t => t =!= ""))
            .cast("long").as("n_tokens"))
        .as[(String, Long, Long, Long)]
      toks.groupByKey(r => (r._1, r._2))
        .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
          val docs = it.toArray.sortBy { case (_, _, id, t) => (-t, id) }
          val shard = s"${key._1}/${key._2}"
          var bin = 1L
          var fill = 0L
          docs.iterator.zipWithIndex.map { case ((_, _, id, t), i) =>
            if (fill > 0L && fill + t > BinCapacity) { bin += 1; fill = t }
            else fill += t
            (id, shard, t, i + 1L, bin, fill)
          }
        }
        .toDF("doc_id", "shard", "n_tokens", "rn", "bin_id", "fill_after")
    },
    Some(s"""WITH RECURSIVE toks AS (
               SELECT doc_id, coalesce(lang, 'unknown') || '/' || (doc_id % 4) AS shard,
                      CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                           AS BIGINT) AS n_tokens
               FROM documents),
             r AS (SELECT doc_id, shard, n_tokens,
                          CAST(row_number() OVER (PARTITION BY shard
                                 ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn
                   FROM toks),
             pack AS (
               SELECT doc_id, shard, n_tokens, rn,
                      CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill_after
               FROM r WHERE rn = 1
               UNION ALL
               SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
                      CASE WHEN p.fill_after + r.n_tokens <= $BinCapacity
                           THEN p.bin_id ELSE p.bin_id + 1 END,
                      CASE WHEN p.fill_after + r.n_tokens <= $BinCapacity
                           THEN p.fill_after + r.n_tokens ELSE r.n_tokens END
               FROM pack p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
             SELECT doc_id, shard, n_tokens, rn, bin_id, fill_after FROM pack""")
  )

  /** q127 — PADDING-WASTE HISTOGRAM: bucket every document by its padded
    * length (next multiple of 64 tokens — the pad-to-aligned-batch rule)
    * and report, per bucket, the doc count, real token mass, padded
    * token mass, and the waste fraction. The batch-shape audit run
    * BEFORE choosing between plain padding and packing (q71/q95 are the
    * cures; q127 measures the disease): a corpus whose mass sits in
    * short buckets wastes most of its FLOPs on pad tokens unless packed.
    * Empty documents land in the smallest bucket at 64 (padded length is
    * never zero — every example occupies at least one alignment unit).
    *
    * Scale shape: one narrow token-count projection, one
    * map-side-combined aggregation on the bucket id (≤ a few hundred
    * buckets regardless of corpus size). All-integer bucket arithmetic
    * (`((n + 63) DIV 64) * 64`, floored at 64); the single waste
    * division is the identical IEEE op on both engines ⇒ exact oracle.
    */
  val paddingWaste = Q(
    "q127_padding_waste",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tokens"))
        .withColumn("bucket",
          greatest(lit(64L), expr("((n_tokens + 63) DIV 64) * 64")))
      toks.groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("real_tokens"))
        .withColumn("padded_tokens", col("bucket") * col("n_docs"))
        .withColumn("waste",
          (col("padded_tokens") - col("real_tokens")).cast("double")
            / col("padded_tokens"))
    },
    Some("""WITH t AS (SELECT greatest(64, ((n + 63) // 64) * 64) AS bucket, n
                       FROM (SELECT len(list_filter(string_split(text, ' '),
                                                    w -> w <> '')) AS n
                             FROM documents)),
            b AS (SELECT bucket, count(*) AS n_docs,
                         CAST(sum(n) AS BIGINT) AS real_tokens
                  FROM t GROUP BY bucket)
            SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs, real_tokens,
                   bucket * n_docs AS padded_tokens,
                   CAST(bucket * n_docs - real_tokens AS DOUBLE)
                     / (bucket * n_docs) AS waste
            FROM b""")
  )

  val all: Seq[Q] = Seq(packing, binPacking, paddingWaste)
}
