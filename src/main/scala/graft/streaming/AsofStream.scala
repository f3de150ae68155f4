package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the stream form of [[graft.ops.AsofJoin]]: every
  * left event is enriched with the latest right event at or before it, per
  * key. This is the canonical stream-table enrichment (orders against the
  * newest price, clicks against the newest session attributes), and the
  * state it carries is exactly what the batch form's running
  * `last(ignoreNulls)` window computes.
  *
  * Total order (identical to the batch form): (ts, side, tie) with rights
  * (side 0) before lefts (side 1) at equal ts — a right at t is visible to
  * a left at the same t, and among rights sharing (key, ts) the largest
  * tie wins because the scan takes the LAST one in order.
  *
  * Watermark discipline (same as [[Patterns]]): a left at ts is emitted
  * once the watermark passes it strictly (no right that could precede it
  * in the order can still arrive in-watermark); finalized rights collapse
  * into an O(1) "best right so far" summary, so steady-state per-key state
  * is ONE summary plus only in-flight events — never a history. The
  * summary itself is the keyed state a stream-table join materializes, and
  * it must outlive quiet periods (a key's next left may come hours later),
  * so state for a key is dropped only if it has neither summary nor
  * buffered events. Same ms-resolution and ≥1 ms watermark-delay rules as
  * [[Patterns]] (GroupState watermarks are ms; Spark's pre-kernel late
  * filter drops boundary ties under a 0-delay watermark).
  */
object AsofStream {

  /** side 0 = right (payload pId/pVal populated), side 1 = left (tie is
    * the left event id). */
  final case class AsofEv(key: Long, ts: Timestamp, side: Int, tie: Long,
                          pId: Long, pVal: Double)

  final case class AsofHit(leftId: Long, key: Long, ts: Timestamp,
                           viewId: Option[Long], viewValue: Option[Double])

  final case class Item(tsMs: Long, side: Int, tie: Long, pId: Long, pVal: Double)

  /** `best*` is the folded summary of every finalized right; meaningful
    * only when bestSet. */
  final case class AsofSt(buf: List[Item], emittedThroughMs: Long,
                          bestSet: Boolean, bestPId: Long, bestPVal: Double)

  private def updateKey(key: Long, rows: Iterator[AsofEv],
                        state: GroupState[AsofSt]): Iterator[AsofHit] = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs()
             else Long.MinValue
    val old = state.getOption.getOrElse(AsofSt(Nil, Long.MinValue, bestSet = false, 0L, 0.0))
    val known = old.buf.iterator.map(i => (i.side, i.tie)).toSet
    val incoming = rows
      .filter(e => e.ts.getTime >= wm)                  // late beyond watermark → dropped
      .filter(e => !known.contains((e.side, e.tie)))    // duplicate delivery → no-op
      .map(e => Item(e.ts.getTime, e.side, e.tie, e.pId, e.pVal))
      .toList.distinctBy(i => (i.side, i.tie))
    val merged = (old.buf ++ incoming).sortBy(i => (i.tsMs, i.side, i.tie))

    // one ordered scan: finalized rights (ts < wm) roll the summary
    // forward, finalized lefts emit against the summary as of their
    // position in the order
    var (bestSet, bestPId, bestPVal) = (old.bestSet, old.bestPId, old.bestPVal)
    val out = scala.collection.mutable.ListBuffer.empty[AsofHit]
    merged.foreach { i =>
      if (i.tsMs < wm) {
        if (i.side == 0) { bestSet = true; bestPId = i.pId; bestPVal = i.pVal }
        else if (i.tsMs >= old.emittedThroughMs)
          out += AsofHit(i.tie, key, new Timestamp(i.tsMs),
            if (bestSet) Some(bestPId) else None,
            if (bestSet) Some(bestPVal) else None)
      }
    }

    val kept = merged.filter(_.tsMs >= wm)
    if (kept.isEmpty && !bestSet) { if (state.exists) state.remove() }
    else {
      state.update(AsofSt(kept, math.max(old.emittedThroughMs, wm),
        bestSet, bestPId, bestPVal))
      // pending events must finalize even if only OTHER keys advance the
      // watermark; a bare summary needs no wake-up (new lefts invoke us)
      if (kept.nonEmpty) state.setTimeoutTimestamp(math.max(wm, 0L) + 1L)
    }
    out.iterator
  }

  /** The streaming operator; `events` must carry a ≥1 ms watermark on ts. */
  def asofStream(events: Dataset[AsofEv]): Dataset[AsofHit] = {
    Patterns.requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateKey)
  }
}
