package graft.incr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.batch.{EdgeIndex, GenericJoin}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Incrementally-maintained graph state for the delta-query motif engine.
  *
  * Spark-native analog of the reference's three-tier `Index`
  * (/root/reference/src/index.rs:16-25):
  *   - tier 1 (compact run)      → `base`: consolidated, persisted DataFrame
  *   - tiers 2+3 (edge lists /   → `tails`: one small persisted frame per
  *     unsorted diffs)             absorbed micro-batch
  * Compaction (`merge_to`, /root/reference/src/index.rs:560-583) folds the
  * tails into a new consolidated base when they grow past a fraction of the
  * base or past `maxTail` batches — amortized O(|E|), never per-batch.
  *
  * Per-batch joins read base ∪ tails un-consolidated (sound by Z-set
  * bilinearity, see [[graft.batch.EdgeIndex]]); the small delta side of each
  * join is broadcast by AQE, so steady-state per-batch work is a set of
  * in-memory scans + broadcast hash joins, no state reshuffle.
  *
  * With `stateDir` set, the state is durable: every absorbed batch is
  * written (write-ahead) as parquet before its output is produced, the
  * compacted base is versioned, and `meta.json` records the last absorbed
  * micro-batch id — so a restarted streaming query resumes exactly-once by
  * skipping already-absorbed batch ids. Per-batch metrics + per-partition
  * lineage are appended to `metrics.jsonl`.
  */
final class GraphState(
    val spark: SparkSession,
    val motif: Seq[(Int, Int)],
    stateDir: Option[String] = None,
    maxTail: Int = 12,
    pruneZero: Boolean = true) {

  import GraphState._

  private var base: DataFrame = emptyEdges(spark)
  private var degFwdBase: DataFrame = emptyDeg(spark)
  private var degRevBase: DataFrame = emptyDeg(spark)
  private var tails: Vector[DataFrame] = Vector.empty
  private var baseRows: Long = 0L
  private var tailRows: Long = 0L
  private var baseVersion: Long = 0L
  private var _lastBatchId: Long = -1L
  private var tailIds: Vector[Long] = Vector.empty

  def lastBatchId: Long = _lastBatchId
  def edgeCount: Long = baseRows + tailRows // rows, not net edges

  stateDir.foreach(recover)

  private def mkIndex(parts: Vector[DataFrame]): EdgeIndex = {
    val all = (base +: parts).reduce(_ unionByName _)
    val tailDegF =
      if (parts.isEmpty) Nil
      else Seq(EdgeIndex.degrees(parts.reduce(_ unionByName _), forward = true))
    val tailDegR =
      if (parts.isEmpty) Nil
      else Seq(EdgeIndex.degrees(parts.reduce(_ unionByName _), forward = false))
    EdgeIndex(
      fwd = all.select(col("src").as("k"), col("dst").as("v"), col("w").as("ew")),
      rev = all.select(col("dst").as("k"), col("src").as("v"), col("w").as("ew")),
      degFwdParts = degFwdBase +: tailDegF,
      degRevParts = degRevBase +: tailDegR)
  }

  /** Current consolidated edge Z-set (for tests / snapshot queries). */
  def edges: DataFrame = EdgeIndex.consolidate((base +: tails).reduce(_ unionByName _))

  /** Absorbs one micro-batch of edge deltas (src,dst[,w]) and returns the
    * consolidated motif match deltas (x0..x{k-1}, w).
    *
    * `sink`, if given, runs on the match frame BEFORE the batch is marked
    * absorbed: an idempotent sink (e.g. overwrite-by-batch-id) composed with
    * the meta commit gives end-to-end exactly-once — a crash between sink
    * and commit replays the batch against unchanged state and reproduces
    * identical output.
    *
    * Contract: consume (or persist) the returned frame before the next
    * `applyBatch` call — compaction at the start of the next call may
    * unpersist frames this one's plan reads. Returns an empty frame without
    * state change when `batchId` was already absorbed (exactly-once replay).
    */
  def applyBatch(batchId: Long, deltas: DataFrame,
                 sink: DataFrame => Unit = _ => ()): DataFrame = {
    if (batchId <= _lastBatchId) return emptyMatches(spark, motif)
    val t0 = System.nanoTime()
    maybeCompact()

    val delta = EdgeIndex.norm(deltas).persist()
    val deltaRows = delta.count()
    stateDir.foreach { dir =>
      // write-ahead: tail batch on disk before any output derived from it
      delta.write.mode("overwrite").parquet(s"$dir/tail/batch=$batchId")
    }

    val oldIdx = mkIndex(tails)
    val newIdx = mkIndex(tails :+ delta)
    val matches = GenericJoin.consolidateMatches(
      GenericJoin.deltaStep(delta, oldIdx, newIdx, motif, pruneZero))
    sink(matches)

    tails :+= delta
    tailIds :+= batchId
    tailRows += deltaRows
    _lastBatchId = batchId
    stateDir.foreach { dir =>
      writeMeta(dir)
      appendMetrics(dir, batchId, deltaRows, t0, delta)
    }
    matches
  }

  private def maybeCompact(): Unit =
    if (tails.size >= maxTail || (baseRows > 0 && tailRows > baseRows / 2)) compact()

  /** Folds tails into a freshly consolidated, persisted base. */
  def compact(): Unit = {
    if (tails.isEmpty) return
    val old = base; val oldF = degFwdBase; val oldR = degRevBase; val oldTails = tails
    val merged = EdgeIndex.consolidate((base +: tails).reduce(_ unionByName _))
      .persist()
    baseRows = merged.count()
    val dF = EdgeIndex.degrees(merged, forward = true).persist()
    val dR = EdgeIndex.degrees(merged, forward = false).persist()
    dF.count(); dR.count()
    base = merged; degFwdBase = dF; degRevBase = dR
    tails = Vector.empty; tailIds = Vector.empty; tailRows = 0L
    baseVersion += 1
    stateDir.foreach { dir =>
      merged.write.mode("overwrite").parquet(s"$dir/base/v=$baseVersion")
      writeMeta(dir)
    }
    old.unpersist(); oldF.unpersist(); oldR.unpersist()
    oldTails.foreach(_.unpersist())
  }

  // ---- durability ----

  private def writeMeta(dir: String): Unit = {
    val json =
      s"""{"baseVersion":$baseVersion,"lastBatchId":${_lastBatchId},"baseRows":$baseRows,"tailBatches":[${tailIds.mkString(",")}]}"""
    val tmp = Paths.get(dir, "meta.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(dir, "meta.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def appendMetrics(dir: String, batchId: Long, rows: Long, t0: Long,
                            delta: DataFrame): Unit = {
    // per-partition lineage: how many delta rows each partition contributed
    val perPart = delta.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => s"""{"p":${r.getInt(0)},"rows":${r.getLong(1)}}""")
    val ms = (System.nanoTime() - t0) / 1e6
    val line =
      s"""{"batchId":$batchId,"inputRows":$rows,"stateRows":${baseRows + tailRows},"wallMs":$ms,"partitions":[${perPart.mkString(",")}]}\n"""
    Files.writeString(Paths.get(dir, "metrics.jsonl"), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def recover(dir: String): Unit = {
    val metaPath = Paths.get(dir, "meta.json")
    if (!Files.exists(metaPath)) return
    val meta = Files.readString(metaPath)
    def longField(name: String): Long =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(meta).map(_.group(1).toLong).getOrElse(0L)
    baseVersion = longField("baseVersion")
    _lastBatchId = longField("lastBatchId")
    baseRows = longField("baseRows")
    val ids = """"tailBatches":\[([^\]]*)\]""".r.findFirstMatchIn(meta)
      .map(_.group(1)).filter(_.nonEmpty).map(_.split(",").map(_.toLong).toVector)
      .getOrElse(Vector.empty)
    if (baseVersion > 0) {
      base = spark.read.parquet(s"$dir/base/v=$baseVersion").persist()
      base.count()
      degFwdBase = EdgeIndex.degrees(base, forward = true).persist()
      degRevBase = EdgeIndex.degrees(base, forward = false).persist()
    }
    tails = ids.map { id =>
      val t = spark.read.parquet(s"$dir/tail/batch=$id").persist(); t.count(); t
    }
    tailIds = ids
    tailRows = tails.map(_.count()).sum
  }

  def close(): Unit = {
    base.unpersist(); degFwdBase.unpersist(); degRevBase.unpersist()
    tails.foreach(_.unpersist())
  }
}

object GraphState {
  private[incr] def emptyEdges(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
        StructField("w", LongType))))

  private[incr] def emptyDeg(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("k", LongType), StructField("deg", LongType))))

  private[incr] def emptyMatches(spark: SparkSession, motif: Seq[(Int, Int)]): DataFrame = {
    val n = motif.flatMap(e => Seq(e._1, e._2)).max + 1
    val fields = (0 until n).map(i => StructField(s"x$i", LongType)) :+ StructField("w", LongType)
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(fields))
  }
}
