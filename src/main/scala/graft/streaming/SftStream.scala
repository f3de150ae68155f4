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
    * pair per target-role turn with ≥1 prior turn, slide the context.
    * Shared with the TWS twin ([[SftTws]]) so both runtimes emit from ONE
    * kernel and cannot drift. */
  private[streaming] def drain(key: String, ctx0: List[(Int, String)],
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

/** The SFT pair-extraction kernel on `transformWithState` (Spark 4
  * stateful v2) — the state-scalable twin of [[SftStream.sftStream]],
  * emitting the SAME pairs through the SAME shared [[SftStream.drain]]
  * walk. The fMGWS form's per-key state is one serialized blob rewritten
  * per arriving turn; here it decomposes into column families so the hot
  * path is incremental (the same trade [[PatternsTws]] measured at 14.9×
  * fewer checkpoint bytes):
  *   - `pend` MapState[turnIdx, (role, text, tsMs)] — O(1) point PUT per
  *     arriving turn; sealing REMOVES exactly the sealed prefix (point
  *     deletes, never a full-buffer rewrite — see the field comment for
  *     why a map beats a RocksDB merge-operand list here);
  *   - `ctx`  ValueState[[[SftTws.Ctx]]] — the carried ≤ctxTurns sealed
  *     pieces + the conversation's last event time; O(ctxTurns) and only
  *     written when something seals.
  * Sealing is timer-driven: while turns are pending a timer sits just past
  * the watermark, so a quiescent conversation still seals when OTHER
  * conversations advance the watermark. When pending empties, a cleanup
  * timer at lastMs + gapMs clears the carried context — the same
  * RESUME-AFTER-TIMEOUT caveat as the fMGWS form, giving bounded state for
  * dead conversations. TWS requires the RocksDB provider (multiple column
  * families), so this composes with [[StateBackend.withRocksDB]]. */
object SftTws {
  import SftStream.{Pair, Turn}

  /** Carried sealed context + last seen event time (for the gap cleanup). */
  final case class Ctx(pieces: Seq[(Int, String)], lastMs: Long)

  final class SftProcessor(targetRole: String, ctxTurns: Int, sep: String,
                           gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Turn, Pair] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
      TimerValues, TTLConfig, ValueState}

    // pend is a MAP keyed by turn_idx, not a list: RocksDB encodes ListState
    // appends as merge operands on ONE key, so background compaction
    // re-merges the whole O(buffer) operand chain as it grows and every
    // exists()/get() pays a full read-time merge — measured as per-batch
    // cost growing with buffer length (the round-5 read-amplification
    // finding). Map entries are separate RocksDB keys: appends are point
    // puts, sealing REMOVES exactly the sealed prefix (no full-list
    // rewrite), and the changelog stays O(appends + seals).
    @transient private var pend: MapState[Int, (String, String, Long)] = _
    @transient private var ctx: ValueState[Ctx] = _
    @transient private var minPend: ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      pend = getHandle.getMapState[Int, (String, String, Long)]("pend",
        Encoders.scalaInt,
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong),
        TTLConfig.NONE)
      ctx = getHandle.getValueState[Ctx]("ctx", Encoders.product[Ctx],
        TTLConfig.NONE)
      minPend = getHandle.getValueState[Long]("minPend",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def watermarkMs(tv: TimerValues): Long = {
      val w = tv.getCurrentWatermarkInMs()
      if (w > 0) w else Long.MinValue
    }

    /** Seal pending turns below the watermark through the shared drain;
      * rewrite `pend` and `ctx` only when something actually changed;
      * re-arm ONE timer (superseded timers are deleted — fMGWS's
      * setTimeoutTimestamp replaces implicitly, TWS timers accumulate
      * unless deleted, and per-key timer growth would erode exactly the
      * checkpoint-bytes advantage this twin exists for). */
    private def sealAndEmit(key: String, wm: Long): List[Pair] = {
      val all = pend.iterator()
        .map { case (idx, (role, text, ts)) => (idx, role, text, ts) }
        .toIndexedSeq
      val (seal, open) = all.partition(_._4 < wm)
      val prev = if (ctx.exists()) ctx.get()
                 else Ctx(Nil, Long.MinValue)
      val lastMs = (prev.lastMs +: all.map(_._4)).max
      val (pairs, c1) = SftStream.drain(key, prev.pieces.toList,
        seal.sortBy(_._1).toList, targetRole, ctxTurns, sep)
      if (seal.nonEmpty) {
        if (open.isEmpty) { pend.clear(); minPend.clear() }
        else {
          seal.foreach(t => pend.removeKey(t._1)) // point removes, no rewrite
          minPend.update(open.iterator.map(_._4).min)
        }
      }
      if (seal.nonEmpty || lastMs != prev.lastMs)
        ctx.update(Ctx(c1, lastMs))
      val next =
        if (open.nonEmpty) math.max(wm, 0L) + 1L
        else math.max(lastMs + gapMs, math.max(wm, 0L) + 1L)
      val it = getHandle.listTimers()
      while (it.hasNext) getHandle.deleteTimer(it.next())
      getHandle.registerTimer(next)
      pairs
    }

    /** The long-buffer hot path (round-5 read-amplification fix, same gate
      * as [[PatternsTws]]): every pending turn sits AT or ABOVE the
      * watermark, so the seal set is provably empty — skip the full-list
      * read + sort. Exact: nothing seals, the carried context cannot
      * slide, and `lastMs` is recomputed from the pending turns (all in
      * hand) at the next real seal, which is the only place it is read
      * while turns are pending (gap cleanup requires an empty buffer). */
    private def gatedSealAndEmit(key: String, wm: Long): List[Pair] =
      if (minPend.exists() && (wm == Long.MinValue || minPend.get() >= wm)) {
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer(math.max(wm, 0L) + 1L)
        Nil
      } else sealAndEmit(key, wm)

    override def handleInputRows(key: String, rows: Iterator[Turn],
        timerValues: TimerValues): Iterator[Pair] = {
      var curMin = if (minPend.exists()) minPend.get() else Long.MaxValue
      val min0 = curMin
      rows.foreach { t =>
        pend.updateValue(t.turnIdx, (t.role, t.text, t.ts.getTime))
        if (t.ts.getTime < curMin) curMin = t.ts.getTime
      }
      if (curMin != min0) minPend.update(curMin)
      gatedSealAndEmit(key, watermarkMs(timerValues)).iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Pair] = {
      val wm = watermarkMs(timerValues)
      // minPend first: pend.exists() on a RocksDB merge-operand list merges
      // ALL n operands at read time — O(buffer) per timer fire
      if (minPend.exists() || pend.exists()) gatedSealAndEmit(key, wm).iterator
      else if (ctx.exists()) {
        // gap cleanup: context of a conversation idle past gapMs of event
        // time is dropped (the documented resume-after-timeout rule);
        // earlier wm+1 timers firing before the gap elapsed re-arm instead
        if (wm >= ctx.get().lastMs + gapMs) ctx.clear()
        else getHandle.registerTimer(ctx.get().lastMs + gapMs)
        Iterator.empty
      } else Iterator.empty
    }
  }

  /** Same contract as [[SftStream.sftStream]] (ts-watermarked input,
    * append output), on the TWS runtime. RocksDB-only. */
  def sftStream(in: Dataset[Turn], targetRole: String, ctxTurns: Int = 4,
                sep: String = "\n", gapMs: Long = 3600000L): Dataset[Pair] = {
    require(ctxTurns >= 1, s"ctxTurns $ctxTurns must be >= 1")
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.convId)
      .transformWithState(new SftProcessor(targetRole, ctxTurns, sep, gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }
}
