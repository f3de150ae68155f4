package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.text.TextOps.P

/** Streaming per-group deterministic bottom-k sampler — the O(k)-STATE twin
  * of the batch `sample_per_group` gate. The batch form is a ranking window
  * (`row_number() OVER (PARTITION BY group ORDER BY keyHash, key) <= k`);
  * the streamed form keeps, per group, only the k smallest (hash, key)
  * pairs seen so far — a running bottom-k is mergeable, so state stays at
  * k tuples per group no matter whether the group has 10 rows or 10
  * billion, and the result is identical to the window by construction
  * (same hash, same tie-break).
  *
  * Because membership is a pure function of the key set (the same
  * [[graft.ops.Sampling.keyHash]] gate as every batch sampler), arrival
  * order, chunking and retries cannot change the draw — the kernel is
  * insensitive to row order within and across micro-batches, the weakest
  * ordering contract of all the streaming twins. The group's sample is
  * emitted once, ranked, when the event-time watermark proves the group
  * complete (no row for `gapMs` of event time); state is then removed. */
object SamplerStream {

  case class Doc(lang: String, docId: Long, ts: java.sql.Timestamp)
  case class SamplerState(hs: List[(Long, Long)], lastMs: Long)
  case class SampleRow(lang: String, rk: Int, doc_id: Long)

  /** [[graft.ops.Sampling.keyHash]] on the JVM side: MINSTD affine map mod
    * the polyHash prime, floorMod for sign parity with Spark's pmod. */
  private def keyHash(key: Long): Long =
    (Math.floorMod(key, P) * 48271L + 7L) % P

  private def process(k: Int, gapMs: Long)(
      key: String, it: Iterator[Doc],
      state: GroupState[SamplerState]): Iterator[SampleRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      s.hs.sorted.iterator.zipWithIndex.map { case ((_, id), i) =>
        SampleRow(key, i + 1, id)
      }
    } else {
      var st = state.getOption.getOrElse(SamplerState(Nil, Long.MinValue))
      var hs = st.hs
      var lastMs = st.lastMs
      for (d <- it) {
        hs = ((keyHash(d.docId), d.docId) :: hs).sorted.take(k)
        lastMs = math.max(lastMs, d.ts.getTime)
      }
      state.update(SamplerState(hs, lastMs))
      // finalize once the watermark passes the group's last row + gap; must
      // exceed the current watermark or Spark rejects the timestamp
      state.setTimeoutTimestamp(
        math.max(lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }
  }

  /** `in` must carry a watermark on `ts` (the gate uses 90 days). */
  def samplePerGroupStream(in: Dataset[Doc], k: Int,
                           gapMs: Long = 3600000L): Dataset[SampleRow] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(k, gapMs))
  }
}
