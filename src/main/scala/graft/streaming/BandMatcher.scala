package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** In-stream MinHash-LSH candidate matching (q342): the operator is
  * keyed by LSH BAND KEY and holds, per band key, the documents that
  * produced that band within the watermark horizon —
  * `MapState[doc_id, (tsSec, nGrams)]`. A new document's band row emits
  * one candidate pair per state partner within `horizonSec` of it, then
  * joins the state itself; exact Jaccard verification happens outside
  * the stream on the (tiny) candidate set, so the unbounded corpus
  * never sits in state — only the horizon's worth of band rows does.
  *
  * STATE BOUND (the 100 TB argument): an entry with
  * `ts < watermark − horizon` can never pair again — arriving rows
  * carry `ts ≥ watermark` (later rows are the watermark's own
  * contract) — so it is evicted on the key's next input AND by an
  * event-time timer at `maxTs + horizon` for keys that never hear
  * another row (the classic leak: a one-document band key would
  * otherwise pin its entry forever). Missed-pair safety of eviction is
  * the same inequality run forward: a surviving partner for a future
  * row at `ts ≥ wm` needs `ts_old ≥ wm − horizon`, which eviction
  * preserves exactly. Out-of-orderness beyond the watermark delay
  * loses candidates — the standard semantics of every watermarked
  * operator, and the delay is the dial.
  *
  * Determinism: batch rows are processed in (ts, doc_id) order and
  * pairs are emitted id-ordered (da < db), so output is independent of
  * partition-internal row order; cross-band duplicate candidates are
  * collapsed by the downstream distinct.
  */
class BandMatcher(horizonSec: Long)
    extends StatefulProcessor[String, (String, Long, java.sql.Timestamp, Long),
      (Long, Long, Long, Long)] {

  @transient private var seen: MapState[Long, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getMapState[Long, (Long, Long)](
      "seen", Encoders.scalaLong, Encoders.product[(Long, Long)], TTLConfig.NONE)

  private def evict(wmSec: Long): Unit = {
    if (wmSec <= 0) return
    val dead = seen.iterator()
      .collect { case (id, (ts, _)) if ts < wmSec - horizonSec => id }
      .toArray
    dead.foreach(seen.removeKey)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    evict(timerValues.getCurrentWatermarkInMs / 1000L)
    val incoming = rows
      .map(r => (r._2, r._3.toInstant.getEpochSecond, r._4))
      .toArray.distinct.sortBy(t => (t._2, t._1))
    val out = Array.newBuilder[(Long, Long, Long, Long)]
    incoming.foreach { case (id, ts, n) =>
      seen.iterator().foreach { case (oid, (ots, on)) =>
        if (oid != id && math.abs(ts - ots) <= horizonSec) {
          if (oid < id) out += ((oid, id, on, n)) else out += ((id, oid, n, on))
        }
      }
      seen.updateValue(id, (ts, n))
    }
    // cleanup timer for the no-more-input case: fires once the
    // watermark proves this batch's newest entry unpairable
    if (incoming.nonEmpty)
      getHandle.registerTimer((incoming.map(_._2).max + horizonSec + 1) * 1000L)
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    evict(timerValues.getCurrentWatermarkInMs / 1000L)
    if (!seen.keys().hasNext) seen.clear()
    Iterator.empty
  }
}
