package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * Structured Streaming analogue of the reference's "reduce sees one whole
  * key-group" contract (`/root/reference/MapReduceClient.h:61-64`), except
  * the group is unbounded in time and the state store carries the open
  * session across micro-batches.
  *
  * Works in both modes: under a streaming query, state persists between
  * batches (asserted in StreamingSessionSpec); under batch execution Spark
  * calls the function once per key with all events, and `flushTrailing`
  * emits the final open session so batch output is complete.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Instant, value: Double)

  /** Open-session accumulator. Money kept in exact cents (the source data
    * is 2-decimal) so the final double equals a decimal-sum oracle.
    */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

  final case class SessionOut(user_id: Long, session_start: Instant, n: Long, sum_value: Double)

  private def us(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def close(user: Long, st: SessionState): SessionOut =
    SessionOut(user,
      Instant.ofEpochSecond(st.startUs / 1000000L, (st.startUs % 1000000L) * 1000L),
      st.n, st.cents / 100.0)

  /** One state-update step. New session when the gap is >= gapUs —
    * matching Spark's session_window merge rule (strict overlap only).
    */
  def update(gapUs: Long, flushTrailing: Boolean)(
      user: Long, events: Iterator[Event], state: GroupState[SessionState])
      : Iterator[SessionOut] = {
    val evs = events.toArray.sortBy(e => (us(e.ts), e.value))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    // FAR-late strays (≥ gap before the open session's start) are buffered
    // for the batch and merged among themselves below — two mutually-close
    // strays belong to ONE replayed session, matching what batch
    // session_window semantics (q36) would produce for those events.
    val strays = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    var cur = state.getOption
    evs.foreach { e =>
      val t = us(e.ts)
      val cents = math.round(e.value * 100)
      cur match {
        // merge window is [start - gap, last + gap): an out-of-order
        // event from a later micro-batch may land before the open
        // session's start — extend with min/max so boundaries never
        // corrupt.
        case Some(st) if t - st.lastUs < gapUs && st.startUs - t < gapUs =>
          cur = Some(st.copy(
            startUs = math.min(st.startUs, t),
            lastUs = math.max(st.lastUs, t),
            n = st.n + 1, cents = st.cents + cents))
        // stray FAR-late event: keep the live session (replacing it with
        // the stray would fragment it) and buffer the stray for merging.
        case Some(st) if st.startUs - t >= gapUs =>
          strays.lastOption match {
            case Some(prev) if t - prev.lastUs < gapUs =>
              strays(strays.length - 1) = prev.copy(
                lastUs = t, n = prev.n + 1, cents = prev.cents + cents)
            case _ =>
              strays += SessionState(t, t, 1, cents)
          }
        case Some(st) =>
          out += close(user, st)
          cur = Some(SessionState(t, t, 1, cents))
        case None =>
          cur = Some(SessionState(t, t, 1, cents))
      }
    }
    // Strays arrive in ascending ts order (evs is sorted), so the
    // lastOption check above already merged mutually-close runs. A later
    // in-batch event may have EXTENDED the open session downward (min
    // start) to within gap of the last stray run — batch session_window
    // would merge that chain, so fold such runs into the open session
    // before closing the rest (consecutive stray runs are ≥ gap apart,
    // so merging can only chain from the tail; loop for safety).
    var chained = true
    while (chained && strays.nonEmpty) {
      (cur, strays.last) match {
        case (Some(st), sl) if st.startUs - sl.lastUs < gapUs =>
          strays.remove(strays.length - 1)
          cur = Some(st.copy(
            startUs = math.min(st.startUs, sl.startUs),
            n = st.n + sl.n, cents = st.cents + sl.cents))
        case _ => chained = false
      }
    }
    // remaining stray runs ended ≥ gap before the open session started
    strays.foreach(st => out += close(user, st))
    if (flushTrailing) {
      cur.foreach(st => out += close(user, st))
      state.remove()
    } else cur.foreach(state.update)
    out.iterator
  }

  /** Sessionize an event set. `flushTrailing = true` for batch (emit the
    * final open session per user), `false` under streaming (leave it in
    * the state store for the next micro-batch).
    */
  def sessions(events: Dataset[Event], gapUs: Long, flushTrailing: Boolean)
      : Dataset[SessionOut] = {
    implicit val se = Encoders.product[SessionState]
    implicit val oe = Encoders.product[SessionOut]
    implicit val ke = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(gapUs, flushTrailing))
  }
}
