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
  *   - tiers 2+3 (edge lists /   → `tail`: ONE persisted frame holding every
  *     unsorted diffs)             micro-batch absorbed since last compaction
  * Compaction (`merge_to`, /root/reference/src/index.rs:560-583) folds the
  * tail into a new consolidated base when it grows past a fraction of the
  * base or past `maxTail` batches — amortized O(|E|), never per-batch.
  *
  * The tail is re-persisted as one frame per batch (cost O(tail), bounded
  * by the compaction policy) so every per-batch join plan has a CONSTANT
  * shape — base arm + tail arm — regardless of how many batches have been
  * absorbed. (Keeping a frame per batch instead makes the logical plan grow
  * per batch inside ~30 join subtrees and Catalyst optimization time blows
  * up quadratically — measured 7s → 16s → 38s per batch before this
  * design.) Joins read base ∪ tail un-consolidated, sound by Z-set
  * bilinearity (see [[graft.batch.EdgeIndex]]).
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
    pruneZero: Boolean = true,
    routing: Boolean = true,
    lineageMetrics: Boolean = true,
    predicates: Seq[GenericJoin.Pred] = Nil) extends MotifState {

  import GraphState._

  private var base: DataFrame = emptyEdges(spark)
  private var degFwdBase: DataFrame = emptyDeg(spark)
  private var degRevBase: DataFrame = emptyDeg(spark)
  private var tail: DataFrame = emptyEdges(spark)
  private var baseRows: Long = 0L
  private var tailRows: Long = 0L
  private var tailBatches: Int = 0
  private var baseVersion: Long = 0L
  private var _lastBatchId: Long = -1L
  private var tailIds: Vector[Long] = Vector.empty
  private var pendingUnpersist: List[DataFrame] = Nil

  def lastBatchId: Long = _lastBatchId
  def edgeCount: Long = baseRows + tailRows // rows, not net edges

  stateDir.foreach(recover)

  /** Index over base + the given tail frame (2 plan arms, constant shape). */
  private def mkIndex(tailFrame: DataFrame, hasTail: Boolean): EdgeIndex = {
    val all = if (hasTail) base.unionByName(tailFrame) else base
    val degF = if (hasTail) Seq(degFwdBase, EdgeIndex.degrees(tailFrame, forward = true))
               else Seq(degFwdBase)
    val degR = if (hasTail) Seq(degRevBase, EdgeIndex.degrees(tailFrame, forward = false))
               else Seq(degRevBase)
    EdgeIndex(
      fwd = all.select(col("src").as("k"), col("dst").as("v"), col("w").as("ew")),
      rev = all.select(col("dst").as("k"), col("src").as("v"), col("w").as("ew")),
      degFwdParts = degF, degRevParts = degR)
  }

  /** Bulk-loads the initial edge set as tier-1 state without emitting match
    * deltas — the reference's `Index::initialize` preload path
    * (/root/reference/src/index.rs:596-599). Requires empty state. */
  def initialize(edges: DataFrame): Unit = {
    require(tailRows == 0L && baseRows == 0L, "initialize requires empty state")
    installBase(EdgeIndex.consolidate(edges))
  }

  /** Installs a freshly consolidated base with TRUNCATED lineage: durable
    * mode re-reads the just-written parquet (plan = file scan); otherwise
    * localCheckpoint. Without this, each compaction nests the previous
    * base's logical plan inside the new one — the cached data stays flat
    * but every subsequent batch's plan deepens by one consolidation layer
    * per cycle, and driver-side planning time grows until it dominates
    * (measured: batches crawl to ~60s near batch 90). */
  private def installBase(consolidated: DataFrame): Unit = {
    baseVersion += 1
    val cleanBase = stateDir match {
      case Some(dir) =>
        consolidated.write.mode("overwrite").parquet(s"$dir/base/v=$baseVersion")
        spark.read.parquet(s"$dir/base/v=$baseVersion").persist()
      case None =>
        consolidated.localCheckpoint(true)
    }
    baseRows = cleanBase.count()
    val dF = EdgeIndex.degrees(cleanBase, forward = true).persist()
    val dR = EdgeIndex.degrees(cleanBase, forward = false).persist()
    dF.count(); dR.count()
    base = cleanBase; degFwdBase = dF; degRevBase = dR
    stateDir.foreach(writeMeta)
  }

  /** Current consolidated edge Z-set (for tests / snapshot queries). */
  def edges: DataFrame = EdgeIndex.consolidate(base.unionByName(tail))

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
    * `applyBatch` call — frames its plan reads may be unpersisted then.
    * Returns an empty frame without state change when `batchId` was already
    * absorbed (exactly-once replay). */
  def applyBatch(batchId: Long, deltas: DataFrame,
                 sink: DataFrame => Unit = _ => ()): DataFrame = {
    if (batchId <= _lastBatchId) return emptyMatches(spark, motif)
    val t0 = System.nanoTime()
    pendingUnpersist.foreach(_.unpersist()); pendingUnpersist = Nil
    maybeCompact()

    val delta = EdgeIndex.norm(deltas).persist()
    val deltaRows = delta.count()
    stateDir.foreach { dir =>
      // write-ahead: tail batch on disk before any output derived from it
      delta.write.mode("overwrite").parquet(s"$dir/tail/batch=$batchId")
    }

    val hadTail = tailRows > 0
    val newTail =
      (if (hadTail) tail.unionByName(delta) else delta).persist()
    newTail.count() // materialize so downstream plans see one in-memory arm

    val oldIdx = mkIndex(tail, hadTail)
    val newIdx = mkIndex(newTail, hasTail = true)
    val matches = GenericJoin.consolidateMatches(
      GenericJoin.deltaStep(delta, oldIdx, newIdx, motif, pruneZero, routing,
        predicates = predicates))
    sink(matches)

    if (hadTail) pendingUnpersist ::= tail
    pendingUnpersist ::= delta
    tail = newTail
    tailRows += deltaRows
    tailBatches += 1
    tailIds :+= batchId
    _lastBatchId = batchId
    stateDir.foreach { dir =>
      writeMeta(dir)
      appendMetrics(dir, batchId, deltaRows, t0, delta)
    }
    matches
  }

  private def maybeCompact(): Unit =
    if (tailBatches >= maxTail || (baseRows > 0 && tailRows > baseRows / 2)) compact()

  /** Folds the tail into a freshly consolidated, persisted base.
    *
    * Crash-window discipline: tail bookkeeping is cleared BEFORE
    * `installBase` persists `meta.json`, so the on-disk meta is never
    * simultaneously new-base (which already contains the folded tail) +
    * old-tail — a crash mid-compaction recovers either (old base, old tail)
    * or (new base, no tail), never a double-counting mix. */
  def compact(): Unit = {
    if (tailRows == 0) return
    val old = base; val oldF = degFwdBase; val oldR = degRevBase; val oldTail = tail
    val foldedIds = tailIds
    val oldVersion = baseVersion
    val consolidated = EdgeIndex.consolidate(base.unionByName(tail))
    tailIds = Vector.empty; tailRows = 0L; tailBatches = 0
    installBase(consolidated)
    tail = emptyEdges(spark)
    old.unpersist(); oldF.unpersist(); oldR.unpersist(); oldTail.unpersist()
    // post-commit GC (best-effort): the new meta no longer references the
    // previous base version or the folded tail batches — delete them so a
    // long-running stream's stateDir stays O(|E|), not O(|E| × compactions).
    stateDir.foreach { dir =>
      rmrf(Paths.get(dir, "base", s"v=$oldVersion").toFile)
      foldedIds.foreach(id => rmrf(Paths.get(dir, "tail", s"batch=$id").toFile))
    }
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rmrf) }
    f.delete(); ()
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
    val perPart =
      if (lineageMetrics)
        delta.groupBy(spark_partition_id().as("pid")).count()
          .collect().map(r => s"""{"p":${r.getInt(0)},"rows":${r.getLong(1)}}""")
      else Array.empty[String]
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
    if (ids.nonEmpty) {
      tail = ids.map(id => spark.read.parquet(s"$dir/tail/batch=$id"))
        .reduce(_ unionByName _).persist()
      tailRows = tail.count()
      tailBatches = ids.size
    }
    tailIds = ids
  }

  def close(): Unit = {
    pendingUnpersist.foreach(_.unpersist()); pendingUnpersist = Nil
    base.unpersist(); degFwdBase.unpersist(); degRevBase.unpersist()
    tail.unpersist()
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
