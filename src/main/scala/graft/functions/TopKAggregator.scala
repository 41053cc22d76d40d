package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed UDAF: keeps the k highest-scoring (id, score)
  * pairs per group in O(k) state — the mergeable-accumulator answer to
  * "top-k neighbors per probe" when a windowed row_number would shuffle
  * every candidate row. Partial aggregation keeps at most k entries per
  * map task, so the shuffle carries k rows per (group × task) instead of
  * the full candidate set — the 100 TB version of the reference's
  * "reduce scans its whole group" top-k encoding (SURVEY.md §2b).
  *
  * Ties break toward the smaller id, matching the engine-portable
  * ordering used by q27/q28. Encoders come from the call site (e.g.
  * `import spark.implicits._`), keeping state columnar — no Kryo blobs.
  */
final case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)(
    implicit bufEnc: Encoder[List[ScoredId]], outEnc: Encoder[Seq[ScoredId]])
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(acc: List[ScoredId], x: ScoredId): List[ScoredId] =
    (x :: acc).sorted(ord).take(k)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    (a ++ b).sorted(ord).take(k)

  override def finish(acc: List[ScoredId]): Seq[ScoredId] = acc

  override def bufferEncoder: Encoder[List[ScoredId]] = bufEnc
  override def outputEncoder: Encoder[Seq[ScoredId]] = outEnc
}
