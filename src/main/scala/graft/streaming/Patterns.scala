package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-style ordered sequence detection — the MATCH_RECOGNIZE shape over a
  * keyed event stream, in two semantically identical forms:
  *
  *  - [[detectBatch]]: declarative DataFrame form (lead() chains over the
  *    per-key event order), Catalyst-optimizable and exactly replayable as
  *    the driver's DuckDB oracle;
  *  - [[detectStream]]: Structured-Streaming form via
  *    `flatMapGroupsWithState` with event-time watermark — matches are
  *    emitted exactly once, when the watermark guarantees no late event can
  *    still land inside the matched window, and per-key buffered state is
  *    evicted up to `watermark - maxSpan`. PatternsSpec pins
  *    stream-over-shuffled-input == batch-over-final-data.
  *
  * SEMANTICS: a match is a run of CONSECUTIVE events (per key, ordered by
  * (ts, event id) — no skips, the strictest MATCH_RECOGNIZE contiguity)
  * whose tags equal `steps` in order, with last.ts - first.ts ≤ maxSpanMs.
  * Every occurrence is reported (overlaps allowed), keyed by its first
  * event.
  *
  * The reference has no CEP surface — this extends the engine along the
  * north rule's streaming/CEP axis (windows + watermarks + stateful
  * detection) using the same late-data discipline as
  * [[AdjacencyDeltas]] (events at or beyond the watermark are dropped).
  *
  * The STREAMING kernels operate at millisecond event-time resolution
  * (`GroupState` watermarks are ms); the batch forms compare microseconds.
  * Stream==batch equality therefore holds for ms-resolution event times
  * (spec fixtures); µs-resolution inputs should use the batch forms.
  * Both stream operators use EventTimeTimeout; Spark does not allow a
  * checkpointed query to change timeout mode, so these operators cannot
  * resume a checkpoint written by a different-timeout build (they shipped
  * with EventTimeTimeout from their first release).
  *
  * WATERMARK DELAY MUST BE ≥ 1 ms. With EventTimeTimeout Spark applies its
  * own late-row filter to the operator INPUT (rows at-or-before the
  * current watermark are removed before the kernel runs). Under a 0-delay
  * watermark, an in-order event whose ms timestamp equals the previous
  * micro-batch's maximum is therefore dropped by Spark at the batch
  * boundary — the kernel never sees it and a match spanning the boundary
  * silently loses its middle event (found by CheckpointRestartSpec's
  * boundary fixture). Any delay ≥ 1 ms keeps every in-order row and
  * changes no emitted result; genuinely late data follows the documented
  * drop rule either way.
  */
object Patterns {

  final case class Ev(key: Long, ts: Timestamp, evId: Long, tag: String)

  /** Rejects a 0-delay watermark up front (see the class doc: Spark's own
    * late filter would drop boundary-tying rows before the kernel). */
  private[streaming] def requireNonZeroWatermarkDelay(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        val d = w.delay
        require(d.months != 0 || d.days != 0 || d.microseconds > 0,
          "watermark delay must be >= 1 millisecond: with EventTimeTimeout " +
            "Spark drops input rows at-or-before the watermark before the " +
            "kernel runs, so a 0-delay watermark silently loses in-order " +
            "events that tie the previous batch's max timestamp")
      case _ =>
    }
  final case class PatMatch(key: Long, startTs: Timestamp, endTs: Timestamp, startId: Long)
  /** Buffered per-key events + the watermark up to which results have
    * already been emitted (exactly-once under watermark advancement).
    * Shared by the sequence and absence detectors. */
  final case class PatState(events: List[(Long, Long, String)], emittedThroughMs: Long)

  /** Shared per-invocation scaffolding for both detectors: watermark
    * sentinel, beyond-watermark drop, duplicate-delivery dedup, merge into
    * ts-ordered state. Returns (watermarkMs, previous state, merged).
    *
    * WATERMARK SENTINEL CAVEAT: `getCurrentWatermarkMs()` returns 0 both
    * before the first watermark commit AND for a genuine watermark of 0, so
    * `> 0` is the only safe "initialized" test the GroupState API permits.
    * Consequence: a stream whose event times sit at/near the epoch
    * indefinitely (max event time never exceeds the watermark delay) keeps
    * wm pinned at the sentinel — results are WITHHELD (never wrong) and
    * per-key buffers are not evicted. Post-1970 event times — every real
    * transcript — advance past this in the first batch; pre-/at-epoch
    * synthetic streams should use the batch forms (same semantics, no
    * watermark). Documented with the ms-resolution caveat above. */
  private def absorb(rows: Iterator[Ev], state: GroupState[PatState])
      : (Long, PatState, IndexedSeq[(Long, Long, String)]) = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else Long.MinValue
    val old = state.getOption.getOrElse(PatState(Nil, Long.MinValue))
    if (rows.isEmpty) // timeout invocation: stored state is already sorted
      return (wm, old, old.events.toIndexedSeq)
    val known = old.events.iterator.map(_._2).toSet
    val incoming = rows
      .filter(e => e.ts.getTime >= wm)       // late beyond watermark → dropped
      .filter(e => !known.contains(e.evId))  // duplicate delivery → no-op
      .map(e => (e.ts.getTime, e.evId, e.tag)).toList.distinctBy(_._2)
    if (incoming.isEmpty) (wm, old, old.events.toIndexedSeq)
    else (wm, old, (old.events ++ incoming).sortBy(t => (t._1, t._2)).toIndexedSeq)
  }

  /** Commits post-invocation state: evicts events older than
    * `wm - retainMs`, advances the emitted-through mark, and — because the
    * operators run with EventTimeTimeout — re-arms a timeout just past the
    * current watermark so a key with PENDING buffered events still emits
    * its finalized results when only OTHER keys advance the watermark
    * (with NoTimeout a quiescent key would withhold output forever). */
  private def commit(state: GroupState[PatState], wm: Long, retainMs: Long,
                     merged: IndexedSeq[(Long, Long, String)],
                     emittedThroughMs: Long): Unit = {
    val evictBefore = if (wm == Long.MinValue) Long.MinValue else wm - retainMs
    val kept = merged.filter(_._1 >= evictBefore).toList
    if (kept.isEmpty) {
      // nothing pending: drop the state (safe — any later event arrives at
      // ts >= wm, so re-starting with a fresh emitted-through mark cannot
      // duplicate results that were finalized strictly before wm)
      if (state.exists) state.remove()
    } else {
      state.update(PatState(kept, math.max(emittedThroughMs, wm)))
      state.setTimeoutTimestamp(math.max(wm, 0L) + 1L)
    }
  }

  /** Batch form: (key, start_ts, end_ts, start_id) per occurrence. */
  def detectBatch(events: DataFrame, steps: Seq[String], maxSpanMs: Long,
                  keyCol: String = "key", tsCol: String = "ts",
                  idCol: String = "ev_id", tagCol: String = "tag"): DataFrame = {
    require(steps.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("ts"), col("ev_id"))
    var d = events.select(col(keyCol).as("key"), col(tsCol).as("ts"),
      col(idCol).as("ev_id"), col(tagCol).as("tag"))
    for (i <- 1 until steps.size)
      d = d.withColumn(s"tag_$i", lead("tag", i).over(w))
        .withColumn(s"ts_$i", lead("ts", i).over(w))
    val cond = steps.indices.map { i =>
      (if (i == 0) col("tag") else col(s"tag_$i")) === steps(i)
    }.reduce(_ && _)
    val lastTs = if (steps.size == 1) col("ts") else col(s"ts_${steps.size - 1}")
    d.where(cond &&
        unix_micros(lastTs.cast("timestamp")) - unix_micros(col("ts").cast("timestamp"))
          <= maxSpanMs * 1000L)
      .select(col("key"), col("ts").as("start_ts"), lastTs.as("end_ts"),
        col("ev_id").as("start_id"))
  }

  /** Matches over a FINAL per-key ordered sequence whose end timestamp is in
    * [fromMs, untilMs) — the shared kernel of the streaming emitter. */
  private[streaming] def matchesIn(ordered: IndexedSeq[(Long, Long, String)], steps: Seq[String],
                        maxSpanMs: Long, fromMs: Long, untilMs: Long,
                        key: Long): List[PatMatch] = {
    val k = steps.size
    val out = scala.collection.mutable.ListBuffer.empty[PatMatch]
    var i = 0
    while (i + k <= ordered.length) {
      val endTs = ordered(i + k - 1)._1
      if (endTs >= fromMs && endTs < untilMs &&
          endTs - ordered(i)._1 <= maxSpanMs) {
        var j = 0
        var ok = true
        while (ok && j < k) { ok = ordered(i + j)._3 == steps(j); j += 1 }
        if (ok) out += PatMatch(key, new Timestamp(ordered(i)._1),
          new Timestamp(endTs), ordered(i)._2)
      }
      i += 1
    }
    out.toList
  }

  /** One fMGWS invocation for key `key` — on new data OR on an event-time
    * timeout (watermark advanced past this key's re-armed timestamp with no
    * new rows): absorb in-watermark events, emit every match whose window
    * the watermark has CLOSED (end ts < wm — no late event can land at or
    * before it anymore), evict buffer entries that can no longer begin an
    * open match, re-arm the timeout while anything is pending. */
  def updateKey(steps: Seq[String], maxSpanMs: Long)(
      key: Long, rows: Iterator[Ev], state: GroupState[PatState]): Iterator[PatMatch] = {
    val (wm, old, merged) = absorb(rows, state)
    // emit matches finalized since the last invocation: end ts in
    // [emittedThrough, wm). Events < emittedThrough are immutable (earlier
    // watermark), so each match is emitted exactly once.
    val out = matchesIn(merged, steps, maxSpanMs, old.emittedThroughMs, wm, key)
    // an event can still matter only if some future match's window
    // [start, end] with end >= wm could contain it → retain maxSpan
    commit(state, wm, maxSpanMs, merged, old.emittedThroughMs)
    out.iterator
  }

  /** The streaming operator. `events` must carry a watermark on its ts
    * column for finalization to advance; emitted columns match
    * [[detectBatch]]. EventTimeTimeout, not NoTimeout: a key whose events
    * have stopped still emits its finalized matches as soon as OTHER keys
    * advance the watermark. */
  def detectStream(events: Dataset[Ev], steps: Seq[String],
                   maxSpanMs: Long): Dataset[PatMatch] = {
    requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateKey(steps, maxSpanMs))
  }

  // ---- negation: A with NO B within a deadline ----

  final case class Absence(key: Long, startTs: Timestamp, startId: Long)

  /** Batch form of "every `a`-tagged event NOT followed by a `b`-tagged
    * event within `withinMs`" (per key, followers ordered by (ts, event
    * id)) — the request-without-response / tool-call-without-result CEP
    * shape. Output (key, start_ts, start_id). */
  def detectAbsenceBatch(events: DataFrame, a: String, b: String, withinMs: Long,
                         keyCol: String = "key", tsCol: String = "ts",
                         idCol: String = "ev_id", tagCol: String = "tag"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("ts"), col("ev_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    events.select(col(keyCol).as("key"), col(tsCol).as("ts"),
        col(idCol).as("ev_id"), col(tagCol).as("tag"))
      .withColumn("next_b_us",
        min(when(col("tag") === b, unix_micros(col("ts").cast("timestamp")))).over(w))
      .where(col("tag") === a &&
        (col("next_b_us").isNull ||
          col("next_b_us") > unix_micros(col("ts").cast("timestamp")) + withinMs * 1000L))
      .select(col("key"), col("ts").as("start_ts"), col("ev_id").as("start_id"))
  }

  /** Streaming absence per key: an `a` event is REPORTED once the watermark
    * passes its deadline (a.ts + within) with no qualifying `b` seen — by
    * then any matching `b` must either have arrived or be droppable-late,
    * which is exactly batch-over-final-data semantics. Buffered events are
    * evicted once their deadline influence has passed. */
  def updateAbsence(a: String, b: String, withinMs: Long)(
      key: Long, rows: Iterator[Ev], state: GroupState[PatState]): Iterator[Absence] = {
    val (wm, old, merged) = absorb(rows, state)
    // finalize `a` events whose deadline fell in [emittedThrough, wm)
    val out = absencesIn(merged, a, b, withinMs, old.emittedThroughMs, wm, key)
    // a `b` at ts matters to `a`s with deadline >= wm, i.e. a.ts >=
    // wm - within and b.ts >= a.ts → retain `within` (same bound
    // finalizes the a's)
    commit(state, wm, withinMs, merged, old.emittedThroughMs)
    out.iterator
  }

  /** Absences over a FINAL per-key ordered sequence whose DEADLINE
    * (a.ts + within) is in [fromMs, untilMs) — the shared kernel of the
    * fMGWS and transformWithState absence emitters. */
  private[streaming] def absencesIn(merged: IndexedSeq[(Long, Long, String)],
      a: String, b: String, withinMs: Long, fromMs: Long, untilMs: Long,
      key: Long): List[Absence] = {
    val out = scala.collection.mutable.ListBuffer.empty[Absence]
    var i = 0
    while (i < merged.length) {
      val (ts, id, tag) = merged(i)
      if (tag == a) {
        val deadline = ts + withinMs
        if (deadline >= fromMs && deadline < untilMs) {
          var j = i + 1
          var seenB = false
          while (!seenB && j < merged.length && merged(j)._1 <= deadline) {
            seenB = merged(j)._3 == b
            j += 1
          }
          if (!seenB) out += Absence(key, new Timestamp(ts), id)
        }
      }
      i += 1
    }
    out.toList
  }

  def detectAbsenceStream(events: Dataset[Ev], a: String, b: String,
                          withinMs: Long): Dataset[Absence] = {
    requireNonZeroWatermarkDelay(events)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateAbsence(a, b, withinMs))
  }
}
