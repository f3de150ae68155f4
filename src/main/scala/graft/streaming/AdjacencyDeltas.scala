package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.EdgeDelta

/** Streaming turn-ordering adjacency with late-turn retraction, as a
  * `flatMapGroupsWithState` operator keyed by conversation.
  *
  * Per-conversation state is the ordered list of (turn_idx, attr_id) seen so
  * far. When a turn arrives — in order or late-but-within-watermark — the
  * operator re-derives the conversation's consecutive-pair edge set and
  * emits the Z-set difference: a late turn j landing between existing turns
  * i and k retracts the previously emitted bridging edge attr(i)→attr(k)
  * (weight −1) and inserts attr(i)→attr(j), attr(j)→attr(k) (+1 each).
  * Turns older than the current watermark are dropped (north-rule late-data
  * semantics); duplicate deliveries of the same turn_idx are ignored, making
  * the operator idempotent under at-least-once replay.
  *
  * This is the keyed-state analog of the reference's update stream feeding
  * `IndexStream::from` (/root/reference/src/extender.rs:62-137): here the
  * *derivation* of the `((src,dst),±1)` stream is itself stateful because
  * transcript order, not edge order, is what arrives.
  */
object AdjacencyDeltas {

  final case class EncTurn(convId: String, turnIdx: Int, attrId: Long, ts: Timestamp)
  final case class ConvState(turns: List[(Int, Long)])

  /** Dictionary-encode a streaming transcript frame against a static dict
    * (key→id), yielding the operator's input. The dict join is broadcast —
    * no shuffle on the stream. */
  def encode(transcripts: DataFrame, dict: DataFrame, attr: String): Dataset[EncTurn] = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    transcripts
      .join(broadcast(dict), col(attr) === col("key"))
      .select(col("conv_id").as("convId"), col("turn_idx").as("turnIdx"),
        col("id").as("attrId"), col("ts"))
      .as[EncTurn]
  }

  private def pairs(turns: List[(Int, Long)]): Map[(Long, Long), Long] =
    turns.zip(turns.drop(1)).foldLeft(Map.empty[(Long, Long), Long]) {
      case (m, ((_, a), (_, b))) => m.updated((a, b), m.getOrElse((a, b), 0L) + 1L)
    }

  def updateConv(
      convId: String,
      rows: Iterator[EncTurn],
      state: GroupState[ConvState]): Iterator[EdgeDelta] = {
    val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else Long.MinValue
    val old = state.getOption.getOrElse(ConvState(Nil))
    val known = old.turns.iterator.map(_._1).toSet
    val incoming = rows
      .filter(t => t.ts.getTime >= wm) // beyond-watermark → dropped
      .filter(t => !known.contains(t.turnIdx)) // duplicate delivery → no-op
      .toList
      .distinctBy(_.turnIdx)
    if (incoming.isEmpty) Iterator.empty
    else {
      val merged = (old.turns ++ incoming.map(t => (t.turnIdx, t.attrId)))
        .sortBy(_._1)
      state.update(ConvState(merged))
      val eventTs = new Timestamp(incoming.iterator.map(_.ts.getTime).max)
      val oldP = pairs(old.turns)
      val newP = pairs(merged)
      (newP.keySet ++ oldP.keySet).iterator.flatMap { k =>
        val d = newP.getOrElse(k, 0L) - oldP.getOrElse(k, 0L)
        if (d == 0L) None else Some(EdgeDelta(k._1, k._2, d, eventTs))
      }
    }
  }

  /** The streaming operator: `transcripts` must already carry a watermark on
    * `ts` if late-data dropping is desired. Works identically on a batch
    * frame (state starts empty, one "batch" = whole input). */
  def stream(turns: Dataset[EncTurn]): Dataset[EdgeDelta] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .groupByKey(_.convId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateConv)
  }
}
