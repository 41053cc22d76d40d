package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-user click totals whose state carries a TIME-TO-LIVE: a
  * `ValueState` registered with `TTLConfig(ttl)` under
  * `TimeMode.ProcessingTime` — the state-hygiene primitive for unbounded
  * key spaces (user ids, session ids, device ids arrive forever; most
  * never return). A key idle longer than the TTL has its state expire
  * WITHOUT a timer, without a tombstone batch, without the processor
  * ever seeing the key again — the engine filters expired values on read
  * and reclaims them in maintenance. The alternative the q195 timer
  * machine demonstrates costs one registered timer per key; TTL costs
  * nothing per key, which is the difference that matters at 10^9 keys.
  *
  * Input (user_id, value); output (user_id, n_click, cents). A key whose
  * state expired restarts from zero — `TtlStateSpec` proves both the
  * expiry and the unexpired continuation across real micro-batches.
  *
  * Reference parity: the reference engine (MapReduceFramework.cpp:118-248)
  * holds all intermediate state for the life of a job and frees it only
  * at closeJobHandle; bounded-lifetime keyed state is the streaming
  * completion of that contract.
  */
class TtlTotals(ttlMillis: Long)
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Long)] {

  @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)],
      TTLConfig(java.time.Duration.ofMillis(ttlMillis)))
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    // expired state reads as absent — the restart-from-zero semantics
    // under test; cents accumulate as longs so batching can't drift
    val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var c = c0
    rows.foreach { r =>
      n += 1
      c += math.round(r._2 * 100.0)
    }
    totals.update((n, c))
    Iterator((key, n, c))
  }
}
