package graft.transcripts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Agent-TRAJECTORY dedup over transcript-shaped tables (beyond-reference
  * pipeline axis): two conversations whose ordered action sequences are
  * identical are the same training example regardless of conv ids or
  * timestamps — RL / agent-trace corpora are full of replays, retried
  * episodes, and templated tool loops, and sequence-level dedup is the
  * curation step that removes them.
  *
  * Scale shape: per-conversation sequence assembly is ONE partial-
  * aggregated groupBy (collect_list + array_sort inside the aggregate —
  * state is O(turns per conversation), which is bounded by episode
  * length, not corpus size); the duplicate-group labeling is a window
  * keyed by the trajectory itself (hash-partitioned, no global ordering).
  * At 10^12 turns the only adjustment is fingerprinting: shuffle
  * xxhash64(traj) instead of the raw string so exchange rows stay narrow —
  * semantics identical modulo a 64-bit collision.
  */
object Trajectories {

  /** One row per conversation: the '|'-joined action sequence under
    * stable (ts, tie) turn order. */
  def trajectories(turns: DataFrame, convCol: String, actionCol: String,
                   tsCol: Column, tieCol: Column): DataFrame =
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(tsCol.as("ts"), tieCol.as("tie"),
            col(actionCol).as("a")))),
          x => x.getField("a")),
        "|").as("traj"))

  /** Duplicate-group labeling of a (conv_id, traj) table — shared by the
    * batch dedup and the streaming twin's post-sink labeling. A traj-keyed
    * window: one shuffle, no self-join, no re-computation of the upstream
    * assembly. */
  def labelGroups(t: DataFrame): DataFrame = {
    val w = Window.partitionBy("traj")
    t.withColumn("keep_conv", min("conv_id").over(w))
      .withColumn("n_dup", count(lit(1)).over(w))
      .select("conv_id", "keep_conv", "n_dup")
  }

  /** Trajectory-level dedup: every conversation labeled with its
    * duplicate-group keeper (min conv id among identical trajectories)
    * and the group size. Output: (conv_id, keep_conv, n_dup). */
  def dedup(turns: DataFrame, convCol: String, actionCol: String,
            tsCol: Column, tieCol: Column): DataFrame =
    labelGroups(trajectories(turns, convCol, actionCol, tsCol, tieCol))
}
