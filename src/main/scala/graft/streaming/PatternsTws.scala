package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
  OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** CEP sequence AND absence detection on Spark 4's
  * arbitrary-stateful-processing v2 (`transformWithState`) — the
  * state-scalable twins of [[Patterns.detectStream]] /
  * [[Patterns.detectAbsenceStream]], emitting the SAME rows for the same
  * input stream + watermark (shared emission kernels
  * [[Patterns.matchesIn]] / [[Patterns.absencesIn]], same
  * watermark-finalization contract, pinned in PatternsTwsSpec and gated
  * against the same DuckDB oracles by the `cep_pattern_seq_tws` /
  * `cep_absence_tws` entries).
  *
  * Why a second implementation exists — the fMGWS form's per-key state is
  * ONE serialized blob: every arriving event deserializes, rewrites and
  * re-serializes the key's ENTIRE buffer, O(|buffer|) writes per event.
  * At 10^12-turn scale with long-lived keys that is the dominating cost.
  * This form decomposes the state into TWS column families so the hot path
  * is incremental:
  *   - `buf`  MapState[evId, (tsMs, tag)] — O(1) point PUT per event, O(1)
  *     duplicate-delivery test (containsKey), point REMOVES at eviction;
  *     never a full-buffer rewrite (see the field comment for why a map
  *     beats a RocksDB merge-operand list);
  *   - `minTs` ValueState[Long] — min buffered ts, the O(1) gate that
  *     skips the full-buffer read while nothing can finalize;
  *   - `emittedThrough` ValueState[Long] — the exactly-once emission mark.
  * TWS requires the RocksDB state store provider (multiple column
  * families), so this operator composes with
  * [[StateBackend.withRocksDB]] — which is the backend the scale argument
  * assumes anyway. Reference analog: the reference's per-key extents are
  * likewise append-organized sorted runs merged on advance, not rewritten
  * per tuple (`/root/reference/src/index.rs:154-186`).
  *
  * Ordering note: appends arrive unsorted across micro-batches, so the
  * emission path sorts the buffer when it actually reads it — paid only on
  * invocations where the watermark can finalize or evict something (the
  * `minTs` gate skips the read otherwise), while WRITES stay O(1) per
  * event.
  *
  * MEASURED trade-off (tools/TwsShape, 64 keys × 2048 buffered events ×
  * 32 batches, both forms on RocksDB, identical outputs): the fMGWS blob
  * form ships **14.9× more state-checkpoint bytes** (67.7 vs 4.6 MiB —
  * each commit re-writes every touched key's whole buffer into the
  * changelog, O(|touched state|), vs O(|appends|) here), and its gap grows
  * linearly with buffer length. That checkpoint traffic is per-commit DFS
  * writes on a real cluster — the binding resource at 10^12 turns. The
  * cost: ~1.2–1.3× higher LOCAL wall time at sandbox scale (element-wise
  * JNI list reads vs one blob get), growing with buffer length
  * (late/early batch ratio 1.4 vs 1.0) — so prefer the fMGWS form for
  * small single-node jobs and this form whenever checkpoint bandwidth or
  * state size binds. The watermark sentinel and ≥1 ms delay
  * caveats of [[Patterns]] apply unchanged ([[TimerValues
  * .getCurrentWatermarkInMs]] is 0 before the first commit, and Spark's
  * pre-operator late filter drops rows at-or-before the watermark).
  */
object PatternsTws {
  import Patterns.{Absence, Ev, PatMatch}

  /** Exported per-key state for live migration FROM the fMGWS kernel:
    * exactly what [[StateInspect.fmgwsPatternState]] reads out of a
    * running deployment's checkpoint. */
  final case class PatInit(events: Seq[(Long, Long, String)],
                           emittedThroughMs: Long)

  /** Shared TWS scaffolding for both detectors: the three column families,
    * the absorb/finalize/evict cycle and the timer re-arm. Subclasses
    * provide only the finalize scan over the ordered buffer (the same
    * kernels the fMGWS forms use) and the retention bound. Extends the
    * WithInitialState variant so the same processor serves both a cold
    * start (plain transformWithState — initial state never fires) and a
    * migration boot ([[detectStreamFrom]]). */
  sealed abstract class BufferedKeyProcessor[O](retainMs: Long)
      extends StatefulProcessorWithInitialState[Long, Ev, O, PatInit] {
    /** Rows finalized by the watermark: emission window [fromMs, untilMs). */
    protected def finalized(merged: IndexedSeq[(Long, Long, String)],
        fromMs: Long, untilMs: Long, key: Long): List[O]

    // buf is a MAP keyed by evId, not a list + seen-set pair: RocksDB
    // encodes ListState appends as merge operands on ONE key, so background
    // compaction re-merges the whole O(buffer) operand chain as it grows
    // and every exists()/get() pays a full read-time merge — measured as
    // per-batch cost growing with buffer length (the round-5
    // read-amplification finding). Map entries are separate RocksDB keys:
    // appends are point puts, the duplicate-delivery test is the SAME
    // containsKey the old seen-family answered (one family instead of
    // two), and eviction point-removes exactly the expired prefix.
    @transient private var buf: MapState[Long, (Long, String)] = _
    @transient private var emitted: ValueState[Long] = _
    @transient private var minBuf: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getMapState[Long, (Long, String)]("buf",
        Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)
      emitted = getHandle.getValueState[Long]("emittedThrough",
        Encoders.scalaLong, TTLConfig.NONE)
      minBuf = getHandle.getValueState[Long]("minTs",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def watermarkMs(tv: TimerValues): Long = {
      val w = tv.getCurrentWatermarkInMs()
      if (w > 0) w else Long.MinValue
    }

    /** Shared finalize path (new-data and timer invocations): emit matches
      * whose window the watermark closed since the last emission mark,
      * evict buffer entries that can no longer begin an open match
      * (REWRITING the list only when something actually evicts), re-arm a
      * timer just past the watermark while anything is pending. */
    private def emitAndEvict(key: Long, wm: Long): List[O] = {
      val emittedThrough = if (emitted.exists()) emitted.get() else Long.MinValue
      val merged = buf.iterator()
        .map { case (id, (ts, tag)) => (ts, id, tag) }
        .toIndexedSeq.sortBy(t => (t._1, t._2))
      val out = finalized(merged, emittedThrough, wm, key)
      val evictBefore = if (wm == Long.MinValue) Long.MinValue else wm - retainMs
      val evicted = merged.takeWhile(_._1 < evictBefore) // merged is ts-sorted
      if (evicted.length == merged.length) {
        // nothing pending: drop all column families (later events arrive at
        // ts >= wm, so a fresh emission mark cannot duplicate finalized rows)
        buf.clear(); emitted.clear(); minBuf.clear()
      } else {
        evicted.foreach(t => buf.removeKey(t._2)) // point removes, no rewrite
        minBuf.update(merged(evicted.length)._1)  // min ts of the kept tail
        emitted.update(math.max(emittedThrough, wm))
        getHandle.registerTimer(math.max(wm, 0L) + 1L)
      }
      out
    }

    /** The long-buffer hot path (the round-5 read-amplification fix): every
      * buffered event sits AT or ABOVE the watermark, so no match can have
      * closed (a finalized match needs its end ts < wm, and ends are the
      * max ts of the run) and eviction (wm - retainMs) can take nothing —
      * skip the full-buffer list read + sort entirely. Exact because new
      * events arrive at ts >= wm too, so delaying the emission mark loses
      * nothing: the next real finalize scans the whole unemitted window.
      * The reference's seal discipline (src/index.rs:154-236) amortizes
      * exactly this way — touch the run only when the frontier crosses it. */
    private def gatedEmitAndEvict(key: Long, wm: Long): List[O] =
      if (minBuf.exists() && (wm == Long.MinValue || minBuf.get() >= wm)) {
        val want = math.max(wm, 0L) + 1L
        val it = getHandle.listTimers()
        var have = false
        while (it.hasNext) if (it.next() == want) have = true
        if (!have) getHandle.registerTimer(want)
        Nil
      } else emitAndEvict(key, wm)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[O] = {
      val wm = watermarkMs(timerValues)
      var appended = false
      var curMin = if (minBuf.exists()) minBuf.get() else Long.MaxValue
      val min0 = curMin
      rows.foreach { e =>
        val t = e.ts.getTime
        // late-beyond-watermark rows are already dropped by Spark's
        // pre-operator filter; the guard stays for defense in depth
        if (t >= wm && !buf.containsKey(e.evId)) {
          buf.updateValue(e.evId, (t, e.tag))
          if (t < curMin) curMin = t
          appended = true
        }
      }
      if (curMin != min0) minBuf.update(curMin)
      // suppress the no-op path cheaply: with neither new events nor an
      // advanced watermark there is nothing to emit or evict
      if (!appended && !buf.exists()) Iterator.empty
      else gatedEmitAndEvict(key, wm).iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[O] =
      // minBuf first: buf.exists() on a RocksDB merge-operand list merges
      // ALL n operands at read time — O(buffer) per timer fire; the minTs
      // value family answers "anything buffered?" in O(1)
      if (!minBuf.exists() && !buf.exists()) Iterator.empty
      else gatedEmitAndEvict(key, watermarkMs(timerValues)).iterator

    /** Migration boot: seed the column families from an exported fMGWS
      * state row. The emitted-through mark is what makes the hand-over
      * exactly-once — matches the old deployment already finalized sit
      * strictly below it and cannot re-emit even though the NEW query's
      * watermark restarts from scratch. A timer is armed so a key that
      * stays quiescent after migration still finalizes its pending
      * buffer when other keys advance the watermark. */
    override def handleInitialState(key: Long, init: PatInit,
        timerValues: TimerValues): Unit = {
      if (init.events.nonEmpty) {
        init.events.foreach(e => buf.updateValue(e._2, (e._1, e._3)))
        minBuf.update(init.events.iterator.map(_._1).min)
        getHandle.registerTimer(
          math.max(timerValues.getCurrentWatermarkInMs(), 0L) + 1L)
      }
      if (init.emittedThroughMs != Long.MinValue)
        emitted.update(init.emittedThroughMs)
    }
  }

  final class SeqProcessor(steps: Seq[String], maxSpanMs: Long)
      extends BufferedKeyProcessor[PatMatch](maxSpanMs) {
    protected def finalized(merged: IndexedSeq[(Long, Long, String)],
        fromMs: Long, untilMs: Long, key: Long): List[PatMatch] =
      Patterns.matchesIn(merged, steps, maxSpanMs, fromMs, untilMs, key)
  }

  /** Absence detection: a `b` at ts matters to `a`s with deadline >= wm,
    * i.e. a.ts >= wm - within — retention `withinMs`, same bound as the
    * fMGWS form. */
  final class AbsenceProcessor(a: String, b: String, withinMs: Long)
      extends BufferedKeyProcessor[Absence](withinMs) {
    protected def finalized(merged: IndexedSeq[(Long, Long, String)],
        fromMs: Long, untilMs: Long, key: Long): List[Absence] =
      Patterns.absencesIn(merged, a, b, withinMs, fromMs, untilMs, key)
  }

  /** The streaming operator: same contract as [[Patterns.detectStream]]
    * (ts-watermarked input required, append output), on the TWS runtime.
    * Must run with the RocksDB state store provider
    * ([[StateBackend.withRocksDB]]); Spark rejects the default provider
    * for multi-column-family state. */
  def detectStream(events: Dataset[Ev], steps: Seq[String],
                   maxSpanMs: Long): Dataset[PatMatch] = {
    require(steps.nonEmpty)
    Patterns.requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new SeqProcessor(steps, maxSpanMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** MIGRATION boot of the sequence detector: continues a stopped fMGWS
    * deployment from its exported state ([[StateInspect.fmgwsPatternState]]
    * → `initial` as (key, events, emittedThroughMs) rows) WITHOUT
    * reprocessing history — pre-stop output ∪ this query's output equals
    * the batch form over the full stream, exactly once (StateMigrateSpec).
    * RocksDB-only, like every TWS operator here. */
  def detectStreamFrom(events: Dataset[Ev], steps: Seq[String],
                       maxSpanMs: Long,
                       initial: Dataset[(Long, Seq[(Long, Long, String)], Long)])
      : Dataset[PatMatch] = {
    require(steps.nonEmpty)
    Patterns.requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    val init = initial.map(t => (t._1, PatInit(t._2, t._3)))
      .groupByKey(_._1).mapValues(_._2)
    events.groupByKey(_.key)
      .transformWithState(new SeqProcessor(steps, maxSpanMs),
        TimeMode.EventTime(), OutputMode.Append(), init)
  }

  /** TWS twin of [[Patterns.detectAbsenceStream]] — same emitted rows
    * (shared [[Patterns.absencesIn]] kernel), incremental column-family
    * state, RocksDB-only. */
  def detectAbsenceStream(events: Dataset[Ev], a: String, b: String,
                          withinMs: Long): Dataset[Absence] = {
    Patterns.requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new AbsenceProcessor(a, b, withinMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
