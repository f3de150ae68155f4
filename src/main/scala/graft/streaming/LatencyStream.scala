package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-conversation response-latency stats — the O(1)-STATE twin
  * of the batch `turn_latency` gate. Unlike [[RenderStream]] (which must
  * buffer every piece until finalization), latency aggregates are
  * mergeable: the state per conversation is six longs — last turn seen,
  * its timestamp, and the running (n, min, max, sum) over the gaps — no
  * matter whether the conversation has 3 turns or 3 million. The row is
  * emitted once the event-time watermark proves the conversation over
  * (no turn for `gapMs` of event time), and the state is removed.
  *
  * Ordering contract (stricter than RenderStream's, and the price of O(1)
  * state): turns must arrive in non-decreasing turn_idx order PER
  * CONVERSATION across micro-batches — the keyed-log guarantee a
  * partitioned source (Kafka keyed by conv_id, a per-key-ordered CDC feed)
  * actually provides. Within a micro-batch the kernel sorts the key's rows
  * itself, so any interleaving inside a batch is fine; a cross-batch
  * regression in turn_idx cannot be repaired without buffering the
  * conversation (that form is [[RenderStream]]'s). Cross-CONVERSATION
  * interleaving is unrestricted either way.
  *
  * Gaps are exact integer microseconds (matching `unix_micros` /
  * DuckDB `epoch_us`), so the streamed aggregates are hash-identical to
  * the batch window form. Single-turn conversations emit nothing (no
  * gaps), matching the batch form's `WHERE gap IS NOT NULL`. */
object LatencyStream {

  case class Turn(convId: String, turnIdx: Int, ts: java.sql.Timestamp)
  case class LatState(lastIdx: Int, lastUs: Long, n: Long, minGap: Long,
                      maxGap: Long, sumGap: Long, lastMs: Long)
  case class LatRow(conv_id: String, n_gaps: Long, min_gap_us: Long,
                    max_gap_us: Long, sum_gap_us: Long)

  /** Exact epoch micros of a Timestamp (getTime floors to millis and
    * getNanos carries the whole fractional second — combine without
    * double-counting the millis). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def process(gapMs: Long)(
      key: String, it: Iterator[Turn],
      state: GroupState[LatState]): Iterator[LatRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      if (s.n > 0L)
        Iterator.single(LatRow(key, s.n, s.minGap, s.maxGap, s.sumGap))
      else Iterator.empty
    } else {
      val turns = it.toIndexedSeq.sortBy(_.turnIdx)
      var st = state.getOption.getOrElse(
        LatState(Int.MinValue, 0L, 0L, Long.MaxValue, Long.MinValue, 0L,
          Long.MinValue))
      for (t <- turns) {
        val us = micros(t.ts)
        if (st.lastIdx != Int.MinValue) {
          val gap = us - st.lastUs
          st = st.copy(n = st.n + 1L, minGap = math.min(st.minGap, gap),
            maxGap = math.max(st.maxGap, gap), sumGap = st.sumGap + gap)
        }
        st = st.copy(lastIdx = t.turnIdx, lastUs = us,
          lastMs = math.max(st.lastMs, t.ts.getTime))
      }
      state.update(st)
      // finalize once the watermark passes the last seen turn + gap; must
      // exceed the current watermark or Spark rejects the timestamp
      state.setTimeoutTimestamp(
        math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def latencyStream(in: Dataset[Turn], gapMs: Long = 3600000L): Dataset[LatRow] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.convId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(gapMs))
  }
}
