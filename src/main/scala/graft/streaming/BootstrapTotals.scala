package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** [[RunningTotals]] with WARM-START: the `StatefulProcessorWithInitialState`
  * variant, whose extra `handleInitialState` hook seeds each key's named
  * state from a batch dataset BEFORE the first micro-batch — the
  * migration path every production stateful pipeline eventually needs
  * (cut over from a batch-computed history, or rebuild a checkpoint the
  * old job format can't carry forward) without replaying history
  * through the stream. The engine co-partitions the initial-state
  * dataset with the stream by key, so seeding is a distributed join-
  * shaped pass, not a driver loop.
  *
  * The seed is (n, cents) exactly as [[RunningTotals]] stores it —
  * cent-exact, so a warm-started stream is bit-equal to having
  * streamed the full history (the q225 oracle's claim).
  */
class BootstrapTotals
    extends StatefulProcessorWithInitialState[Long, (Long, Double), (Long, Long, Double), (Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInitialState(key: Long, initialState: (Long, Long),
      timerValues: TimerValues): Unit =
    totals.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { r =>
      n += 1
      cents += math.round(r._2 * 100.0)
    }
    totals.update((n, cents))
    Iterator((key, n, cents / 100.0))
  }
}
