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

  val all: Seq[Q] = Seq(packing)
}
