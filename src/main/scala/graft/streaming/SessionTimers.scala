package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap-based sessionization driven by EVENT-TIME TIMERS — the
  * `transformWithState` feature q189's running totals don't touch: the
  * processor asks the ENGINE to call it back when the watermark passes
  * "last event + gap", instead of deciding session boundaries while
  * consuming input. That inversion is what production session pipelines
  * need — a session closes because time PASSED, not because another
  * record happened to arrive for the key — and before per-key timers the
  * only ways to get it were GroupStateTimeout's single coarse timeout or
  * a sweep over all keys per batch.
  *
  * Protocol per key:
  *  - `handleInputRows` only BUFFERS (ListState of (tsUs, cents)) and
  *    keeps one registered timer at the key's earliest possible seal
  *    point (no later than "earliest buffered event + gap" — arming a
  *    timer at the NEWEST event is the classic bug: a key with fresh
  *    activity would never fire, stranding its old sealed sessions);
  *    it emits nothing — emission is the timer's job.
  *  - `handleExpiredTimer` fires when the watermark passes that point:
  *    it sorts the buffer, splits it into gap-islands (the q36 rule —
  *    split at gap ≥ gapUs), emits every island the watermark has
  *    sealed (last + gap ≤ watermark — no event can ever extend it,
  *    because anything later than the watermark is dropped upstream),
  *    and retains the still-open tail with a re-armed timer.
  *
  * State is bounded by open sessions only (closed islands leave state at
  * emission); money rides as exact integer cents (dsum2's discipline —
  * see RunningTotals). Timer times are ms — registration rounds UP
  * (+1 ms) so a µs-grained "last + gap" is never sealed a hair early.
  */
class SessionTimers(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long, Double)] {

  @transient private var buf: ListState[(Long, Long)] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[(Long, Long)](
      "buf", Encoders.product[(Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Move the key's one timer EARLIER (never later): the timer must fire
    * by the EARLIEST possible seal point — "earliest buffered event +
    * gap" lower-bounds "first island's last + gap", and firing early is
    * harmless (the handler emits nothing and re-arms at the exact seal
    * point), while firing late strands old sealed islands behind a
    * key's newer activity.
    */
  private def armNoLaterThan(expiryMs: Long): Unit = {
    val cur = if (armed.exists()) armed.get() else Long.MaxValue
    if (expiryMs < cur) {
      if (cur != Long.MaxValue) getHandle.deleteTimer(cur)
      getHandle.registerTimer(expiryMs)
      armed.update(expiryMs)
    }
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Double)] = {
    var minUs = Long.MaxValue
    rows.foreach { r =>
      buf.appendValue((r._2, r._3))
      if (r._2 < minUs) minUs = r._2
    }
    if (minUs != Long.MaxValue) armNoLaterThan((minUs + gapUs) / 1000 + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long, Double)] = {
    val wUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val evs = buf.get().toArray.sorted
    if (evs.isEmpty) { armed.clear(); return Iterator.empty }
    // split the sorted buffer into gap-islands (split where gap >= gapUs)
    val islands = scala.collection.mutable.ArrayBuffer.empty[Array[(Long, Long)]]
    var start = 0
    var i = 1
    while (i < evs.length) {
      if (evs(i)._1 - evs(i - 1)._1 >= gapUs) {
        islands += evs.slice(start, i); start = i
      }
      i += 1
    }
    islands += evs.slice(start, evs.length)
    val (closed, open) = islands.partition(is => is.last._1 + gapUs <= wUs)
    if (open.flatten.isEmpty) { buf.clear(); armed.clear() }
    else {
      buf.put(open.flatten.toArray)
      armed.clear()
      // re-arm at the EARLIEST retained island's exact seal point — the
      // next moment any of this key's sessions can close
      armNoLaterThan((open.map(_.last._1).min + gapUs) / 1000 + 1)
    }
    closed.iterator.map { is =>
      (key, is.head._1, is.last._1, is.length.toLong,
        is.iterator.map(_._2).sum / 100.0)
    }
  }
}
