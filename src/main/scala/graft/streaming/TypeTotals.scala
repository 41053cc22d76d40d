package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.MapState

/** Per-user, per-event-type running totals via `transformWithState`
  * MAP state — the third named-state primitive ([[RunningTotals]] covers
  * ValueState, [[SessionTimers]] ListState): one `MapState[String,
  * (Long, Long)]` per user keyed by event type, the natural encoding
  * when the per-key state is itself a small dynamic dictionary. The
  * alternative — keying the OPERATOR by (user, type) — would work for
  * the totals but loses the per-user view: `keys()` iteration here
  * yields the user's distinct-type count in the same pass, state that
  * two separate keyed operators would have to join to reconstruct.
  *
  * RocksDB stores each map entry as its own composite-keyed row, so a
  * map update touches ONE entry, not a serialized blob of the whole
  * map — the reason MapState beats a ValueState[Map[...]] as per-user
  * dictionaries grow (the 100 TB shape: per-entity feature maps with
  * thousands of slots, updated sparsely).
  *
  * Totals accumulate as exact integer cents (the dsum2 discipline in
  * imperative form); emission is per (user, type) touched in the batch,
  * carrying the type-count-so-far — both monotone, so the stream's
  * final answer per key is `max(struct(...))` regardless of batching.
  */
class TypeTotals
    extends StatefulProcessor[Long, (Long, String, Double), (Long, String, Long, Long, Long)] {

  @transient private var perType: MapState[String, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    perType = getHandle.getMapState[String, (Long, Long)](
      "perType", Encoders.STRING, Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Double)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long, Long)] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { r =>
      val t = r._2
      val (n, cents) =
        if (perType.containsKey(t)) perType.getValue(t) else (0L, 0L)
      perType.updateValue(t, (n + 1, cents + math.round(r._3 * 100.0)))
      touched += t
    }
    var nTypes = 0L
    perType.keys().foreach(_ => nTypes += 1)
    touched.iterator.map { t =>
      val (n, cents) = perType.getValue(t)
      (key, t, n, cents, nTypes)
    }
  }
}
