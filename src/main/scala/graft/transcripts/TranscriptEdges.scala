package graft.transcripts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch derivations of the motif edge stream from a transcript table
  * (SURVEY.md §1.4): dictionary-encode string attributes to node ids, then
  * derive (src,dst,w) Z-set edges. Streaming (retraction-producing)
  * derivation lives in [[graft.streaming.AdjacencyDeltas]]; these batch
  * forms are its oracle and the bulk-load path.
  */
object TranscriptEdges {

  /** Node-id spaces (disjoint): roles are tiny dense ids, tools are dense
    * ids offset by `toolBase`, conversations are hashed into [2^60, 2^61).
    * Hashing (not a global dictionary) keeps conversation encoding
    * shuffle-free at 10^12-turn scale; collisions over a 60-bit space are
    * negligible and only perturb the bipartite graph, never per-turn rows. */
  val toolBase = 1000L
  val convBase = 1L << 60

  def convNodeId(convId: Column): Column =
    pmod(xxhash64(convId), lit(convBase)) + lit(convBase)

  /** Dense ids for a string attribute, assigned by sorted key order
    * (deterministic under any parallelism). The rank plan is size-gated
    * ([[graft.sources.Layout.denseRankByOrder]]): a single row_number
    * window only while the key set is small; past the threshold a
    * range-partitioned sort + zipWithIndex computes the identical ids with
    * no single-partition exchange. */
  def denseDict(df: DataFrame, keyCol: String, base: Long,
                windowMaxRows: Long = graft.sources.Layout.defaultWindowMaxRows): DataFrame =
    graft.sources.Layout.denseRankByOrder(
      df.select(col(keyCol).as("key")).where(col("key").isNotNull).distinct(),
      Seq(col("key").asc), "id", base, windowMaxRows)

  def toolDict(transcripts: DataFrame): DataFrame = denseDict(transcripts, "tool", toolBase)
  def roleDict(transcripts: DataFrame): DataFrame = denseDict(transcripts, "role", 0L)

  /** conv→tool bipartite edges: one +1 edge per turn that used a tool. */
  def convToolEdges(transcripts: DataFrame): DataFrame = {
    val dict = toolDict(transcripts)
    transcripts.where(col("tool").isNotNull)
      .join(broadcast(dict), col("tool") === col("key"))
      .select(convNodeId(col("conv_id")).as("src"), col("id").as("dst"),
        lit(1L).as("w"), col("ts"))
  }

  /** Turn-ordering adjacency over a string attribute (`role` or `tool`):
    * attr(turn i) → attr(turn i+1) within each conversation, via a window
    * lag — the reference's role→role derivation (SURVEY.md §1.4). The
    * window partitions by conv_id, so it scales horizontally. */
  def adjacencyEdges(transcripts: DataFrame, attr: String, base: Long): DataFrame = {
    val dict = denseDict(transcripts, attr, base)
    val enc = transcripts
      .join(broadcast(dict), col(attr) === col("key"))
      .select(col("conv_id"), col("turn_idx"), col("id"), col("ts"))
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    enc
      .withColumn("next_id", lead("id", 1).over(w))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .where(col("next_id").isNotNull)
      .select(col("id").as("src"), col("next_id").as("dst"), lit(1L).as("w"),
        greatest(col("ts"), col("next_ts")).as("ts"))
  }

  def roleRoleEdges(transcripts: DataFrame): DataFrame =
    adjacencyEdges(transcripts, "role", 0L)

  /** tool(turn i) → tool(turn i+1): the triangle-rich, Zipf-skewed motif
    * graph used by the streaming benchmark. */
  def toolToolEdges(transcripts: DataFrame): DataFrame =
    adjacencyEdges(transcripts, "tool", toolBase)

  /** Pass-through projection preserving per-turn text under stable
    * (conv_id, turn_idx) ordering — the per-row invariant vs the reference
    * (BASELINE.json input_hint). */
  def passThrough(transcripts: DataFrame): DataFrame =
    transcripts.select("conv_id", "turn_idx", "text")
}
