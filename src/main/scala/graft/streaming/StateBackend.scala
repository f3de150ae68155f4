package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Switches Structured Streaming's keyed-state backend to RocksDB for the
  * queries started inside a scope, and proves (non-vacuously) that RocksDB
  * actually served the state.
  *
  * Why this exists at all: the north rule targets 10^12-turn transcript
  * streams. Every stateful operator in the catalog — dedup-within-watermark,
  * flatMapGroupsWithState CEP kernels, the symmetric stream-stream join —
  * keeps per-key state whose working set at that scale exceeds any
  * executor's heap. The default HDFSBackedStateStoreProvider materializes
  * each partition's ENTIRE state map on-heap per micro-batch; RocksDB keeps
  * it off-heap on local disk with block-cache reads, and with changelog
  * checkpointing enabled each commit ships only the batch's delta to the
  * checkpoint instead of a full snapshot — O(|batch|) checkpoint I/O
  * instead of O(|state|), which is the difference between a feasible and an
  * infeasible commit at 10^12 keys. Reference analog: the reference's index
  * shards are likewise out-of-core-friendly sorted runs
  * (`/root/reference/src/index.rs:343-384` keeps per-key extents, not a
  * heap-resident hash of the whole graph).
  *
  * The provider class is read once per query START (it is a per-query
  * SQLConf), so scoping the conf around `start()` is sound and cannot leak
  * into concurrently-running queries already started.
  */
object StateBackend {
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Runs `body` with the session's state store provider set to RocksDB
    * (plus incremental changelog checkpointing), restoring the previous
    * settings afterwards so later entries in the same Verify sweep keep
    * their default backend. */
  def withRocksDB[T](s: SparkSession)(body: => T): T = {
    val prevProvider = s.conf.getOption(ProviderKey)
    val prevChangelog = s.conf.getOption(ChangelogKey)
    s.conf.set(ProviderKey, RocksDBProvider)
    s.conf.set(ChangelogKey, "true")
    try body
    finally {
      prevProvider.fold(s.conf.unset(ProviderKey))(v => s.conf.set(ProviderKey, v))
      prevChangelog.fold(s.conf.unset(ChangelogKey))(v => s.conf.set(ChangelogKey, v))
    }
  }

  /** Gate that the query's state was REALLY served by RocksDB: its progress
    * must carry RocksDB-specific custom metrics (`rocksdb*`). Without this,
    * a silently-ignored conf would leave the RocksDB entries testing the
    * default provider twice — a vacuous gate. Called before the query is
    * stopped (progress is drained per micro-batch, so recentProgress is
    * populated by then). */
  def requireRocksDBServed(q: StreamingQuery): Unit = {
    import scala.jdk.CollectionConverters._
    val ops = q.recentProgress.toIndexedSeq.flatMap(_.stateOperators.toIndexedSeq)
    require(ops.nonEmpty, "rocksdb gate: query reported no stateful operators")
    val keys = ops.flatMap(_.customMetrics.keySet().asScala)
    require(keys.exists(_.startsWith("rocksdb")),
      s"rocksdb gate: state not served by RocksDB (custom metrics seen: " +
        s"${keys.distinct.take(8).mkString(", ")})")
  }
}
