package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** GLOBAL TRAINING-ORDER assignment: a training run consumes the corpus in
  * one deterministic shuffled order, and every document needs its global
  * position in that order (epoch shard boundaries, resume-from-step,
  * curriculum schedules all index into it).
  *
  * The order itself is a seeded hash — deterministic, rerun-stable, and
  * uniformly shuffling (the same portable md5 family as the split/sample
  * operators). The hard part at scale is the POSITION: a
  * `row_number() OVER (ORDER BY …)` with no partition key collapses the
  * whole corpus into ONE window partition — the canonical scale anti-
  * pattern. The scalable shape is the classic two-phase enumeration:
  * range-repartition by the sort key (Spark's distributed sort machinery:
  * sampled range boundaries, then a local sort per partition), then
  * `zipWithIndex` — which runs one lightweight job to collect per-partition
  * COUNTS (O(partitions) driver state, not O(rows)) and assigns each row
  * `partitionOffset + localIndex` with no further shuffle. Positions are
  * independent of where the sampled range boundaries land, because the
  * concatenation of range-partitioned, locally-sorted partitions IS the
  * total order.
  *
  * This is the one registered operator built on the RDD API — global
  * enumeration is genuinely per-partition imperative logic (the SURVEY §2c
  * "RDD only where Catalyst can't express it" clause); everything up to
  * the index assignment stays a DataFrame.
  */
object GlobalOrder {

  val globalOrder = Q(
    "q98_global_order",
    (s, d) => {
      import s.implicits._
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"),
          TextFns.md5Hex(concat(lit("order|"), col("doc_id"))).as("h"))
      val sorted = keyed
        .repartitionByRange(col("h"), col("doc_id"))
        .sortWithinPartitions(col("h"), col("doc_id"))
        .as[(Long, String)]
      val indexed = sorted.rdd.zipWithIndex()
        .map { case ((id, h), i) => (id, h, i + 1L) }
      s.createDataset(indexed).toDF("doc_id", "h", "pos")
    },
    Some("""SELECT doc_id, md5(concat('order|', doc_id)) AS h,
                   CAST(row_number() OVER (ORDER BY md5(concat('order|', doc_id)), doc_id)
                        AS BIGINT) AS pos
            FROM documents""")
  )

  val all: Seq[Q] = Seq(globalOrder)
}
