package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LOCF resample — the stateful twin of the batch
  * `resample_ffill` gate: per key, emit one row per hour-grid point in
  * [trunc(first ts)+1h, trunc(last ts)], each carrying the latest value
  * at-or-before it (ties at one ts resolve by largest tie id).
  *
  * What this adds over [[AsofStream]]: the grid rows are SYNTHESIZED from
  * state — the operator emits rows the input never contained (the
  * Flink-timer pattern), not transformed arrivals.
  *
  * Emission is two-tier:
  *  - hours STRICTLY below an arriving event's ts flush immediately
  *    (event-driven; the arrival proves the key's grid upper bound
  *    trunc(max ts) reaches them, and their LOCF value excludes it);
  *  - an hour an event lands EXACTLY on is finalized by the event-time
  *    TIMEOUT, not on arrival — at-or-before is inclusive, and a tied
  *    event with a larger id may still arrive (same micro-batch or a
  *    later one) and change the hour's value. Once the watermark passes
  *    the key's last event no such tie can exist, so the timeout flushes
  *    that boundary hour (the only case where nextH ≤ trunc(lastTs)) and
  *    KEEPS the state: the timeout proves the watermark passed the last
  *    SEEN event, not that the key is done — evicting here would restart
  *    a still-active key's grid (caught by the one-event-per-micro-batch
  *    spec arm, which fires timeouts between every pair of arrivals).
  *
  * Eviction is a separate, optional idle horizon (`evictAfterMs`): a key
  * silent for that long past its last event is flushed and removed,
  * trading bounded state for a grid restart if it ever returns. The gate
  * replays a finite corpus and keeps the default (no eviction).
  *
  * State is O(1) per key: (next pending hour, latest (ts, tie, value)).
  * Contract: per-key event-time order ACROSS micro-batches (the driver
  * replay feeds sorted chunks, as for [[AsofStream]]); within a batch the
  * iterator is sorted here. The `ts` field is the µs timestamp floored to
  * ms for watermarking only — all grid arithmetic runs on the exact µs
  * longs. Callers advance the watermark past the data (two far-future
  * sentinel batches, the shared replay discipline) so every key's
  * boundary hour finalizes. */
object ResampleStream {

  case class RsEv(key: Long, tsUs: Long, tie: Long, value: Double,
                  ts: java.sql.Timestamp)
  case class RsState(nextHUs: Long, lastTsUs: Long, lastTie: Long, lastVal: Double)
  case class RsOut(key: Long, hUs: Long, value: Double)

  val HourUs: Long = 3600L * 1000 * 1000

  def ev(key: Long, tsUs: Long, tie: Long, value: Double): RsEv =
    RsEv(key, tsUs, tie, value,
      new java.sql.Timestamp(Math.floorDiv(tsUs, 1000L)))

  private def truncHourUs(tsUs: Long): Long =
    Math.floorDiv(tsUs, HourUs) * HourUs

  private[streaming] def process(evictAfterMs: Long)(
      key: Long, it: Iterator[RsEv],
      state: GroupState[RsState]): Iterator[RsOut] = {
    if (state.hasTimedOut) {
      // watermark passed the key's last SEEN event: no same-ts tie can
      // arrive anymore, so the exact-boundary hour (the only case where
      // nextH ≤ trunc(lastTs)) is final. The key may still be active —
      // keep the state so later events extend the grid seamlessly; only
      // the idle horizon evicts.
      var st = state.get
      val out = scala.collection.mutable.ArrayBuffer[RsOut]()
      while (st.nextHUs <= truncHourUs(st.lastTsUs)) {
        out += RsOut(key, st.nextHUs, st.lastVal)
        st = st.copy(nextHUs = st.nextHUs + HourUs)
      }
      val lastMs = Math.floorDiv(st.lastTsUs, 1000L)
      val wm = state.getCurrentWatermarkMs()
      if (evictAfterMs != Long.MaxValue && wm >= lastMs + evictAfterMs) {
        state.remove()
      } else {
        state.update(st)
        if (evictAfterMs != Long.MaxValue)
          state.setTimeoutTimestamp(math.max(lastMs + evictAfterMs, wm + 1L))
        // no horizon: nothing further is pending until new data arrives,
        // so no new timeout — the boundary flush above was idempotent
      }
      return out.iterator
    }
    val evs = it.toArray.sortBy(e => (e.tsUs, e.tie))
    var st = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer[RsOut]()
    var i = 0
    while (i < evs.length) {
      val e = evs(i)
      if (st == null) {
        // first event of the key opens the grid one full hour later
        st = RsState(truncHourUs(e.tsUs) + HourUs, e.tsUs, e.tie, e.value)
      } else {
        // hours strictly before this event: its value must not leak in,
        // and no later same-ts tie can change them
        while (st.nextHUs < e.tsUs) {
          out += RsOut(key, st.nextHUs, st.lastVal)
          st = st.copy(nextHUs = st.nextHUs + HourUs)
        }
        if (e.tsUs > st.lastTsUs ||
            (e.tsUs == st.lastTsUs && e.tie > st.lastTie))
          st = RsState(st.nextHUs, e.tsUs, e.tie, e.value)
        // an event exactly ON the pending hour is NOT flushed here — a
        // larger-tie twin at the same ts may still arrive; the timeout
        // finalizes it once the watermark proves nothing more can
      }
      i += 1
    }
    if (st != null) {
      state.update(st)
      // fire once the watermark passes the key's last event; must exceed
      // the current watermark or Spark rejects the timestamp
      val lastMs = Math.floorDiv(st.lastTsUs, 1000L)
      state.setTimeoutTimestamp(math.max(lastMs, state.getCurrentWatermarkMs()) + 1L)
    }
    out.iterator
  }

  /** `in` must carry a watermark on `ts` (the gate uses 1 ms). */
  def resampleStream(in: Dataset[RsEv],
                     evictAfterMs: Long = Long.MaxValue): Dataset[RsOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(evictAfterMs))
  }
}
