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
  * Flink-timer pattern), not transformed arrivals. Emission is
  * event-driven rather than watermark-driven: grid hour H may only be
  * emitted once some event with ts ≥ H proves the key's grid upper bound
  * trunc(max ts) reaches H, so each arrival first flushes every pending
  * hour strictly below its ts (their LOCF value excludes it), then is
  * absorbed, then flushes an exact-boundary hour (at-or-before is
  * inclusive). After the final event the pending hour is > trunc(max ts)
  * by construction, so convergence needs no sentinel.
  *
  * State is O(1) per key: (next pending hour, latest (ts, tie, value)).
  * Contract: per-key event-time order ACROSS micro-batches (the driver
  * replay feeds sorted chunks, as for [[AsofStream]]); within a batch the
  * iterator is sorted here. A production deployment would bound idle-key
  * state with an event-time timeout — omitted in the gate, which replays
  * a finite corpus. */
object ResampleStream {

  case class RsEv(key: Long, tsUs: Long, tie: Long, value: Double)
  case class RsState(nextHUs: Long, lastTsUs: Long, lastTie: Long, lastVal: Double)
  case class RsOut(key: Long, hUs: Long, value: Double)

  val HourUs: Long = 3600L * 1000 * 1000

  private def truncHourUs(tsUs: Long): Long =
    Math.floorDiv(tsUs, HourUs) * HourUs

  private[streaming] def process(key: Long, it: Iterator[RsEv],
                                 state: GroupState[RsState]): Iterator[RsOut] = {
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
        // hours strictly before this event: its value must not leak in
        while (st.nextHUs < e.tsUs) {
          out += RsOut(key, st.nextHUs, st.lastVal)
          st = st.copy(nextHUs = st.nextHUs + HourUs)
        }
        if (e.tsUs > st.lastTsUs ||
            (e.tsUs == st.lastTsUs && e.tie > st.lastTie))
          st = RsState(st.nextHUs, e.tsUs, e.tie, e.value)
        // an event exactly on the boundary is at-or-before it (inclusive)
        if (e.tsUs == st.nextHUs) {
          out += RsOut(key, st.nextHUs, st.lastVal)
          st = st.copy(nextHUs = st.nextHUs + HourUs)
        }
      }
      i += 1
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def resampleStream(in: Dataset[RsEv]): Dataset[RsOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(process)
  }
}
