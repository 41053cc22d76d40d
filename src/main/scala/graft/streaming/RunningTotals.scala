package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running totals via Spark 4's `transformWithState` — the
  * ARBITRARY-STATE API that replaces `flatMapGroupsWithState` (q47's
  * machinery): explicit named state variables created against a
  * `StatefulProcessorHandle` (ValueState here; ListState/MapState and
  * per-key timers are the same handle), which the engine stores in
  * RocksDB (the API requires the RocksDB provider — q187's knob is a
  * prerequisite, not an option, for this operator family).
  *
  * Sums accumulate as exact integer CENTS (the data carries 2-decimal
  * values), so cross-batch accumulation order can never drift a double:
  * the emitted total is one final division — the dsum2 discipline
  * inside imperative state.
  */
class RunningTotals
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { r =>
      n += 1
      cents += math.round(r._2 * 100.0)
    }
    totals.update((n, cents))
    // running emission: one row per key per batch holding the total SO
    // FAR — monotone in n, so the final row per key is max(struct(n,.))
    Iterator((key, n, cents / 100.0))
  }
}
