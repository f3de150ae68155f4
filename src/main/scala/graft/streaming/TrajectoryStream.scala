package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half of agent-trajectory dedup — the stateful twin of
  * [[graft.transcripts.Trajectories]]: per conversation, buffer
  * (ts, tie, action) triples as they arrive (any order, any batching,
  * late cohorts included) and emit ONE '|'-joined action sequence once
  * the event-time watermark proves the conversation over (no turn for
  * `gapMs` of event time). Duplicate-group labeling is downstream of the
  * sink ([[graft.transcripts.Trajectories.labelGroups]]) — the stream's
  * job is exactly the part that needs per-key state.
  *
  * State is O(turns in the conversation) — the same bound as the batch
  * assembly's per-group aggregate payload — and is REMOVED at emission,
  * so steady-state memory is (open conversations × mean open length),
  * bounded by the watermark gap, not the stream length. Ordering
  * contract: none required; buffered actions sort by (event-time ms,
  * tie) at emission, matching the batch array_sort exactly.
  *
  * Caveat (the drop rule every stream twin here shares): a turn arriving
  * AFTER its conversation's timeout fired re-opens the key and emits a
  * second, partial trajectory; the gate's 90-day watermark delay covers
  * the replayed corpus's span so this cannot happen there. */
object TrajectoryStream {

  case class TTurn(conv: Long, tie: Long, action: String,
                   ts: java.sql.Timestamp)
  case class TBuf(acts: List[(Long, Long, String)], lastMs: Long)
  case class TTraj(conv_id: Long, traj: String)

  private def process(gapMs: Long)(
      key: Long, it: Iterator[TTurn],
      state: GroupState[TBuf]): Iterator[TTraj] = {
    if (state.hasTimedOut) {
      val sorted = state.get.acts.sortBy(a => (a._1, a._2))
      state.remove()
      Iterator.single(TTraj(key, sorted.iterator.map(_._3).mkString("|")))
    } else {
      var lastMs = state.getOption.map(_.lastMs).getOrElse(Long.MinValue)
      val add = it.map { t =>
        lastMs = math.max(lastMs, t.ts.getTime)
        (t.ts.getTime, t.tie, t.action)
      }.toList
      state.update(TBuf(state.getOption.map(_.acts).getOrElse(Nil) ::: add,
        lastMs))
      state.setTimeoutTimestamp(
        math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def trajStream(in: Dataset[TTurn], gapMs: Long = 3600000L): Dataset[TTraj] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.conv)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(gapMs))
  }
}
