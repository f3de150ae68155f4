package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SFT training-pair extraction — the stateful twin of the batch
  * `TranscriptDocs.sftPairs` gate: as a conversation's turns arrive (any
  * batching, LATE turns included), each target-role turn becomes a
  * (prompt, completion) example whose prompt is the last ≤`ctxTurns` prior
  * turns rendered "role:text" in stable turn_idx order.
  *
  * Unlike [[RenderStream]] (which must hold every piece until the
  * conversation closes — rendering needs the whole document), pair
  * extraction only ever looks `ctxTurns` turns back, so this kernel emits
  * INCREMENTALLY and prunes: every invocation, turns whose event time the
  * watermark has passed are SEALED (Spark drops any later arrival at or
  * below the watermark, so the sealed prefix is complete), their pairs are
  * emitted immediately, and only the last `ctxTurns` sealed turns are
  * retained as context for the still-open suffix. Steady-state per-key
  * state is O(ctxTurns + unsealed suffix) — bounded by the watermark
  * delay, NOT by conversation length — which is what lets a 10^12-turn
  * deployment run pair extraction at ingest without per-conv memory creep.
  * The event-time timeout drains the final suffix and removes the key.
  *
  * Ordering contract: turn_idx must be monotone in event time within a
  * conversation (the north input derives turn_idx FROM the ts order, so
  * this holds by construction). Under that contract the sealed prefix is
  * always a turn_idx prefix and the emitted pairs equal the batch gate's
  * lag-window output for any delivery schedule inside the watermark delay,
  * provided no conversation sits idle past gapMs (the RESUME-AFTER-TIMEOUT
  * caveat below).
  *
  * Caveats (documented rules, shared with every stream twin here):
  *  - DROP: a turn arriving after the watermark has passed it is dropped
  *    by Spark before the kernel sees it — the gate's 90-day delay makes
  *    that impossible for the replayed corpus, exactly as a production
  *    delay is chosen to cover the redelivery horizon.
  *  - RESUME-AFTER-TIMEOUT: the event-time timeout drains AND REMOVES the
  *    key, including its carried context (keeping it would be unbounded
  *    state for dead conversations). An ON-TIME turn arriving after its
  *    conversation's gap timeout fired (idle > gapMs of event time)
  *    re-opens the key with EMPTY context, so its first pairs carry a
  *    shorter prompt than the batch gate's — the same re-open rule as
  *    [[RenderStream]]'s second-partial-document caveat. Choose gapMs to
  *    cover the longest legitimate intra-conversation silence; the driver
  *    gate's sentinel margin guarantees no real conversation times out
  *    before its turns are all sealed. */
object SftStream {

  case class Turn(convId: String, turnIdx: Int, role: String, text: String,
                  ts: java.sql.Timestamp)
  /** ctx = last ≤ctxTurns SEALED turns (turn_idx asc); pending = unsealed. */
  case class SBuf(ctx: List[(Int, String)], pending: List[(Int, String, String, Long)],
                  lastMs: Long)
  case class Pair(conv_id: String, turn_idx: Long, prompt: String,
                  completion: String)

  private def piece(role: String, text: String): String =
    (if (role == null) "" else role) + ":" + (if (text == null) "" else text)

  /** Walk `seal` (sorted by turn_idx) against the carried context: emit a
    * pair per target-role turn with ≥1 prior turn, slide the context. */
  private def drain(key: String, ctx0: List[(Int, String)],
                    seal: List[(Int, String, String, Long)],
                    targetRole: String, ctxTurns: Int, sep: String)
      : (List[Pair], List[(Int, String)]) = {
    var ctx = ctx0 // turn_idx asc, size ≤ ctxTurns
    val out = List.newBuilder[Pair]
    // exact parity with the batch lag-window gate: the only filter is
    // turn_idx > 1 (an empty context renders an empty prompt, exactly as
    // four null lags concat_ws to "")
    seal.foreach { case (idx, role, text, _) =>
      if (role == targetRole && idx > 1)
        out += Pair(key, idx.toLong, ctx.iterator.map(_._2).mkString(sep), text)
      ctx = (ctx :+ (idx -> piece(role, text))).takeRight(ctxTurns)
    }
    (out.result(), ctx)
  }

  private def process(targetRole: String, ctxTurns: Int, sep: String,
                      gapMs: Long)(
      key: String, it: Iterator[Turn],
      state: GroupState[SBuf]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      val st = state.get
      val (pairs, _) = drain(key, st.ctx,
        st.pending.sortBy(_._1), targetRole, ctxTurns, sep)
      state.remove()
      pairs.iterator
    } else {
      val prev = state.getOption.getOrElse(SBuf(Nil, Nil, Long.MinValue))
      var lastMs = prev.lastMs
      val arrived = it.map { t =>
        lastMs = math.max(lastMs, t.ts.getTime)
        (t.turnIdx, t.role, t.text, t.ts.getTime)
      }.toList
      val wm = state.getCurrentWatermarkMs()
      // strict <: rows AT the watermark could in principle still arrive
      val (seal, open) = (prev.pending ::: arrived).partition(_._4 < wm)
      val (pairs, ctx) = drain(key, prev.ctx, seal.sortBy(_._1),
        targetRole, ctxTurns, sep)
      state.update(SBuf(ctx, open, lastMs))
      state.setTimeoutTimestamp(
        math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      pairs.iterator
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def sftStream(in: Dataset[Turn], targetRole: String, ctxTurns: Int = 4,
                sep: String = "\n", gapMs: Long = 3600000L): Dataset[Pair] = {
    require(ctxTurns >= 1, s"ctxTurns $ctxTurns must be >= 1")
    import in.sparkSession.implicits._
    in.groupByKey(_.convId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        process(targetRole, ctxTurns, sep, gapMs))
  }
}
