package graft.incr

import org.apache.spark.sql.DataFrame

/** Common surface of the two incremental motif engines:
  * [[GraphState]] (DataFrame delta plans — the semantic oracle) and
  * [[graft.fast.FastGraphState]] (sharded-RDD state, constant per-batch
  * driver cost — the production streaming path). */
trait MotifState {
  def motif: Seq[(Int, Int)]
  def lastBatchId: Long
  /** Bulk preload without emitting match deltas. Requires empty state. */
  def initialize(edges: DataFrame): Unit
  /** Absorbs one micro-batch of (src,dst[,w]) deltas; returns consolidated
    * match deltas (x0..x{k-1}, w). `sink` runs before the absorb commits
    * (exactly-once with an idempotent sink); replayed ids are no-ops. */
  def applyBatch(batchId: Long, deltas: DataFrame,
                 sink: DataFrame => Unit = _ => ()): DataFrame
  def close(): Unit
}
