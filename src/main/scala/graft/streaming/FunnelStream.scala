package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel attainment — the O(steps)-state twin of the batch
  * `funnel_steps` gate (earliest view, earliest click strictly after it,
  * earliest purchase strictly after that, per user).
  *
  * State per user is one timestamp per ATTAINED stage plus the last event
  * time — never the event history — because under ts-ordered delivery the
  * batch min-chain is exactly a one-pass machine: the first stage-k event
  * with ts strictly above the stage-(k−1) attainment IS min(ts > prev), and
  * equal-ts ties are order-insensitive both ways (a stage-k+1 event at the
  * same ts as the stage-k attainment fails the strict inequality no matter
  * which is processed first, matching the batch strict `>`).
  *
  * Ordering contract (same as [[LatencyStream]]): per-user non-decreasing
  * ts ACROSS micro-batches — the keyed-log guarantee; within a batch the
  * kernel sorts the user's rows itself. Events whose tag is not the next
  * expected stage are ignored in O(1). A user emits one row — their final
  * funnel depth — when the event-time watermark proves them quiet for
  * `gapMs`; users who never attained stage 1 emit nothing. */
object FunnelStream {

  case class Ev(userId: Long, ts: java.sql.Timestamp, tag: String)
  case class FunnelState(reachedUs: List[Long], lastMs: Long)
  case class FunnelRow(user_id: Long, depth: Int)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def process(steps: IndexedSeq[String], gapMs: Long)(
      key: Long, it: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val depth = state.get.reachedUs.size
      state.remove()
      if (depth > 0) Iterator.single(FunnelRow(key, depth)) else Iterator.empty
    } else {
      var st = state.getOption.getOrElse(FunnelState(Nil, Long.MinValue))
      var reached = st.reachedUs // attained-stage micros, most recent first
      var lastMs = st.lastMs
      for (ev <- it.toIndexedSeq.sortBy(e => micros(e.ts))) {
        val depth = reached.size
        if (depth < steps.size && ev.tag == steps(depth)) {
          val us = micros(ev.ts)
          if (depth == 0 || us > reached.head) reached ::= us
        }
        lastMs = math.max(lastMs, ev.ts.getTime)
      }
      state.update(FunnelState(reached, lastMs))
      state.setTimeoutTimestamp(
        math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def funnelStream(in: Dataset[Ev], steps: Seq[String],
                   gapMs: Long = 3600000L): Dataset[FunnelRow] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(steps.toIndexedSeq, gapMs))
  }
}
