package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user "k most recent purchases" tracker via `transformWithState`
  * LIST STATE — the third state shape of the q189 family (ValueState
  * q189, MapState q223): bounded per-key collections the engine persists
  * in RocksDB, the "recent items / last sessions / rolling features"
  * class every personalization and fraud pipeline keeps. The list is
  * REWRITTEN each batch as the top-k (k = 3) by (ts, event_id) over
  * {stored ∪ batch rows}, so state per key is O(k) forever — an
  * append-only list would grow with history, which is the mistake this
  * processor exists to demonstrate against. A ValueState counter rides
  * along (two named state variables in one processor — they share the
  * key but version independently).
  *
  * Determinism: rows within a micro-batch reach the key in UNSPECIFIED
  * order, so the merge is order-insensitive by construction (a sort on
  * the total order (ts desc, event_id desc) before truncation), and the
  * ListState read-back order doesn't matter for the same reason. The
  * emitted counter is strictly increasing across a key's emissions
  * (handleInputRows only fires for keys WITH rows), so the stream's
  * final answer per key is `max(struct(n, last3))` — q189's
  * batching-independence discipline.
  */
class RecentPurchases
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, String)] {

  private val K = 3

  @transient private var recent: ListState[(Long, Long)] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[(Long, Long)](
      "recent", Encoders.product[(Long, Long)], TTLConfig.NONE)
    seen = getHandle.getValueState[Long](
      "seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Input: (user_id, tsMicros, event_id). Output: (user_id, n_purch,
    * comma-joined event_ids of the ≤3 most recent purchases, newest
    * first).
    */
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, String)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    if (recent.exists()) recent.get().foreach(buf += _)
    var n = if (seen.exists()) seen.get() else 0L
    rows.foreach { r => buf += ((r._2, r._3)); n += 1 }
    val top = buf.sortBy(t => (-t._1, -t._2)).take(K)
    recent.put(top.toArray)
    seen.update(n)
    Iterator((key, n, top.map(_._2).mkString(",")))
  }
}
