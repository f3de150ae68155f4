package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming chat→document rendering — the stateful twin of the batch
  * `transcript_render` gate: per conversation, buffer (turn_idx, piece)
  * pairs as they arrive (any order, any batching — LATE turns included),
  * and emit ONE rendered document once the event-time watermark proves the
  * conversation is over (no turn has arrived for `gapMs` of event time).
  *
  * Unlike [[AsofStream]]/[[ResampleStream]] the per-key state is O(turns in
  * the conversation), not O(1) — rendering inherently needs every piece
  * until finalization. That is the same bound as the batch render's
  * per-group payload (one conversation, never the corpus), and the state is
  * REMOVED at emission, so steady-state memory is (open conversations ×
  * mean open length) — the watermark gap, not the stream length, bounds it
  * at 10^12-turn scale.
  *
  * Ordering contract: none required. Turns may arrive across micro-batches
  * in any order; the buffered pieces are sorted by turn_idx at emission, so
  * the output is the stable-(conv_id, turn_idx) render regardless of
  * delivery schedule — the north rule's per-turn-text-equality invariant
  * under late data.
  *
  * Caveat (documented drop rule, shared with every stream twin here): a
  * turn arriving AFTER its conversation's gap timeout has fired re-opens
  * the key and eventually emits a second, partial document — the gate's
  * watermark delay (90 d > the corpus span) makes that impossible for the
  * replayed corpus, exactly as a production delay is chosen to cover the
  * redelivery horizon. */
object RenderStream {

  case class Turn(convId: String, turnIdx: Int, piece: String,
                  ts: java.sql.Timestamp)
  case class RBuf(pieces: List[(Int, String)], lastMs: Long)
  case class RDoc(conv_id: String, n_turns: Long, doc: String)

  private def process(sep: String, gapMs: Long)(
      key: String, it: Iterator[Turn],
      state: GroupState[RBuf]): Iterator[RDoc] = {
    if (state.hasTimedOut) {
      val sorted = state.get.pieces.sortBy(_._1)
      state.remove()
      Iterator.single(RDoc(key, sorted.size.toLong,
        sorted.iterator.map(_._2).mkString(sep)))
    } else {
      var lastMs = state.getOption.map(_.lastMs).getOrElse(Long.MinValue)
      val add = it.map { t =>
        lastMs = math.max(lastMs, t.ts.getTime)
        (t.turnIdx, t.piece)
      }.toList
      val st = RBuf(state.getOption.map(_.pieces).getOrElse(Nil) ::: add, lastMs)
      state.update(st)
      // finalize once the watermark passes the last seen turn + gap; must
      // exceed the current watermark or Spark rejects the timestamp
      state.setTimeoutTimestamp(
        math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def renderStream(in: Dataset[Turn], sep: String = "\n",
                   gapMs: Long = 3600000L): Dataset[RDoc] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.convId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(sep, gapMs))
  }
}
