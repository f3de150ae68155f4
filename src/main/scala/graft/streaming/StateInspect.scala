package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Offline introspection of Structured Streaming checkpoints through
  * Spark's `statestore` / `state-metadata` data sources — the audit
  * surface a production deployment needs: inspect or validate a running
  * job's keyed state straight from the checkpoint, without stopping the
  * query or attaching to its JVM. At 10^12-turn scale this is how an
  * operator answers "what is the dedup working set", "which keys hold the
  * largest CEP buffers", "is state skewed across partitions" — as a plain
  * DataFrame, with every downstream graft operator available over it.
  * (Reference analog: none — the reference's state is process-internal; a
  * crashed or wedged job there can only be debugged by replaying input.) */
object StateInspect {

  /** Per-operator state metadata for a checkpoint: operator/store names,
    * partition counts, and the min/max batch ids still readable. */
  def metadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)

  /** Raw state rows (key struct, value struct, partition_id) for one store
    * of one stateful operator at the latest committed batch. */
  def store(spark: SparkSession, checkpointDir: String,
            options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("statestore")
    options.foreach { case (k, v) => r.option(k, v) }
    r.load(checkpointDir)
  }

  /** The retained key set of a dropDuplicates(WithinWatermark) operator —
    * i.e. the exact-once dedup working set, one column per dedup key. */
  def dedupKeys(spark: SparkSession, checkpointDir: String,
                keyFields: String*): DataFrame =
    store(spark, checkpointDir)
      .select(keyFields.map(f => col(s"key.$f").as(f)): _*)

  /** One transformWithState column family (`stateVarName`) of a TWS
    * operator — e.g. the CEP kernel's `buf` ListState (one output row per
    * list element), `seen` MapState or `emittedThrough` ValueState. The
    * per-variable audit the blob-state fMGWS form cannot offer. */
  def stateVar(spark: SparkSession, checkpointDir: String,
               name: String): DataFrame =
    store(spark, checkpointDir, Map("stateVarName" -> name))

  /** Registered event-time timers of a TWS operator (key, expiration). */
  def timers(spark: SparkSession, checkpointDir: String): DataFrame =
    store(spark, checkpointDir, Map("readRegisteredTimers" -> "true"))

  /** The fMGWS CEP kernel's per-key state read back from a checkpoint as
    * (key, events[(tsMs, evId, tag)], emittedThroughMs) — the export half
    * of live-state migration: feed this to
    * [[PatternsTws.detectStreamFrom]] as initial state and the TWS kernel
    * continues where the fMGWS deployment stopped, reprocessing nothing. */
  def fmgwsPatternState(spark: SparkSession, checkpointDir: String): DataFrame =
    store(spark, checkpointDir)
      .select(col("key.value").as("key"),
        col("value.groupState.events").as("events"),
        col("value.groupState.emittedThroughMs").as("emittedThroughMs"))

  /** Per-partition state-row counts for one store — the skew audit: a
    * hot-key pile-up shows up as a heavy partition here long before it
    * fails a stage. */
  def partitionHistogram(spark: SparkSession, checkpointDir: String,
                         options: Map[String, String] = Map.empty): DataFrame =
    store(spark, checkpointDir, options)
      .groupBy(col("partition_id"))
      .count()
}
