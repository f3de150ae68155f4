package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.streaming.Patterns.{Ev, PatMatch}

/** Live-state MIGRATION between stateful-operator generations without
  * reprocessing history: a deployment running the fMGWS CEP kernel is
  * stopped mid-stream, its checkpointed per-key state is read back OFFLINE
  * (statestore source → [[StateInspect.fmgwsPatternState]]), and the TWS
  * kernel boots from it as INITIAL STATE ([[PatternsTws.detectStreamFrom]])
  * and continues — pre-stop output ∪ post-migration output must equal the
  * batch form over the full history, exactly once. At 10^12 turns this is
  * the only affordable way to change stateful-operator implementations:
  * replaying history is weeks of compute, exporting state is one scan. */
class StateMigrateSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll with SparkTestBase {

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-mig-$tag").toFile
    dirs += d
    d.getAbsolutePath
  }
  override def afterAll(): Unit = {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rmrf) }
      f.delete(); ()
    }
    dirs.foreach(rmrf)
    super.afterAll()
  }

  test("fMGWS -> TWS migration: union of outputs == batch, exactly once") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("a", "b", "c")
    val span = 10000L
    // 3 keys × repeating a→b→c runs; key 2 goes QUIESCENT before the
    // migration point (its pending state must finalize via the timer armed
    // at boot, with only other keys advancing the new query's watermark)
    val evs = (for {
      key <- 0L until 3L
      i <- 0 until 30
      if key != 2L || i < 12
    } yield Ev(key, new Timestamp(1700000000000L + i * 1000L),
      key * 1000 + i, steps(i % 3))).sortBy(e => (e.ts.getTime, e.evId))
    val (firstHalf, secondHalf) = evs.splitAt(45)

    // ---- generation 1: the fMGWS deployment, stopped mid-stream ----
    val cp1 = tmpDir("cp1")
    val out1 = tmpDir("out1")
    val src1 = MemoryStream[Ev]
    val q1 = Patterns.detectStream(
        src1.toDS().withWatermark("ts", "1 millisecond"), steps, span)
      .writeStream.format("parquet").option("path", out1)
      .option("checkpointLocation", cp1).outputMode("append").start()
    try {
      for (chunk <- firstHalf.grouped(15)) { src1.addData(chunk); q1.processAllAvailable() }
    } finally q1.stop()

    // ---- offline export of the live state ----
    val exported = StateInspect.fmgwsPatternState(spark, cp1)
      .as[(Long, Seq[(Long, Long, String)], Long)]
    assert(exported.count() > 0, "migration fixture must carry pending state")

    // ---- generation 2: the TWS kernel boots from the exported state ----
    val out2 = tmpDir("out2")
    val cp2 = tmpDir("cp2")
    StateBackend.withRocksDB(spark) {
      val src2 = MemoryStream[Ev]
      val q2 = PatternsTws.detectStreamFrom(
          src2.toDS().withWatermark("ts", "1 millisecond"), steps, span, exported)
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", cp2).outputMode("append").start()
      try {
        for (chunk <- secondHalf.grouped(15)) { src2.addData(chunk); q2.processAllAvailable() }
        val far = evs.last.ts.getTime + 3 * span + 1000000L
        src2.addData(Ev(-1L, new Timestamp(far), -1L, "z")); q2.processAllAvailable()
        src2.addData(Ev(-1L, new Timestamp(far + 1000L), -2L, "z")); q2.processAllAvailable()
      } finally q2.stop()
    }

    val got = (spark.read.parquet(out1).collect() ++
        spark.read.parquet(out2).collect())
      .map(r => (r.getLong(r.fieldIndex("key")),
        r.getTimestamp(r.fieldIndex("startTs")).getTime,
        r.getTimestamp(r.fieldIndex("endTs")).getTime,
        r.getLong(r.fieldIndex("startId"))))
      .filter(_._1 != -1L).toSeq
    assert(got.length == got.toSet.size,
      "migration must not re-emit matches the old generation finalized")
    val batch = Patterns.detectBatch(
        evs.toDF().select(col("key"), col("ts"), col("evId").as("ev_id"),
          col("tag")), steps, span)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got.toSet == batch,
      s"union mismatch: got ${got.size} rows, batch ${batch.size}")
    // non-vacuity: matches SPAN the migration point (start before, end
    // after), so the hand-over really carried live buffers across
    val cut = firstHalf.last.ts.getTime
    assert(batch.exists(m => m._2 <= cut && m._3 > cut),
      "fixture must contain matches spanning the migration cut")
    assert(got.nonEmpty)
  }

  test("migration REPARTITIONS state: gen-2 boots the exported state at a " +
    "different shuffle-partition count") {
    // Spark welds a stateful checkpoint to the partition count it started
    // with — a restart cannot change spark.sql.shuffle.partitions. At
    // 10^12 turns outgrowing the original count is inevitable, and the
    // export/boot path is the escape hatch: the exported state is an
    // ordinary Dataset, so the new generation's initial-state shuffle
    // re-keys it into ANY partitioning. Pin: gen 1 runs at the session's
    // 4 partitions, gen 2 at 9; state-metadata confirms both checkpoints'
    // layouts and the union of outputs still equals the batch form.
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("a", "b", "c")
    val span = 10000L
    val evs = (for {
      key <- 0L until 6L
      i <- 0 until 12
    } yield Ev(key, new Timestamp(1700000000000L + i * 1000L),
      key * 1000 + i, steps(i % 3))).sortBy(e => (e.ts.getTime, e.evId))
    // cut MID-TRIPLE (every key holds a pending a→b buffer) so matches
    // genuinely span the repartition hand-over
    val (firstHalf, secondHalf) = evs.splitAt(30)

    val cp1 = tmpDir("rp-cp1"); val out1 = tmpDir("rp-out1")
    val src1 = MemoryStream[Ev]
    val q1 = Patterns.detectStream(
        src1.toDS().withWatermark("ts", "1 millisecond"), steps, span)
      .writeStream.format("parquet").option("path", out1)
      .option("checkpointLocation", cp1).outputMode("append").start()
    try {
      for (chunk <- firstHalf.grouped(12)) { src1.addData(chunk); q1.processAllAvailable() }
    } finally q1.stop()
    val gen1Parts = StateInspect.metadata(spark, cp1)
      .select("numPartitions").collect().map(_.getInt(0)).distinct.toSeq
    assert(gen1Parts == Seq(4), s"gen-1 state must sit at 4 partitions: $gen1Parts")

    val exported = StateInspect.fmgwsPatternState(spark, cp1)
      .as[(Long, Seq[(Long, Long, String)], Long)]
    assert(exported.count() > 0)

    val out2 = tmpDir("rp-out2"); val cp2 = tmpDir("rp-cp2")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    StateBackend.withRocksDB(spark) {
      spark.conf.set("spark.sql.shuffle.partitions", "9")
      try {
        val src2 = MemoryStream[Ev]
        val q2 = PatternsTws.detectStreamFrom(
            src2.toDS().withWatermark("ts", "1 millisecond"), steps, span, exported)
          .writeStream.format("parquet").option("path", out2)
          .option("checkpointLocation", cp2).outputMode("append").start()
        try {
          for (chunk <- secondHalf.grouped(12)) { src2.addData(chunk); q2.processAllAvailable() }
          val far = evs.last.ts.getTime + 3 * span + 1000000L
          src2.addData(Ev(-1L, new Timestamp(far), -1L, "z")); q2.processAllAvailable()
          src2.addData(Ev(-1L, new Timestamp(far + 1000L), -2L, "z")); q2.processAllAvailable()
        } finally q2.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    val gen2Parts = StateInspect.metadata(spark, cp2)
      .select("numPartitions").collect().map(_.getInt(0)).distinct.toSeq
    assert(gen2Parts == Seq(9),
      s"gen-2 state must land at the NEW partition count: $gen2Parts")

    val got = (spark.read.parquet(out1).collect() ++
        spark.read.parquet(out2).collect())
      .map(r => (r.getLong(r.fieldIndex("key")),
        r.getTimestamp(r.fieldIndex("startTs")).getTime,
        r.getTimestamp(r.fieldIndex("endTs")).getTime,
        r.getLong(r.fieldIndex("startId"))))
      .filter(_._1 != -1L).toSeq
    assert(got.length == got.toSet.size, "no re-emission across the repartition")
    val batch = Patterns.detectBatch(
        evs.toDF().select(col("key"), col("ts"), col("evId").as("ev_id"),
          col("tag")), steps, span)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got.toSet == batch,
      s"union mismatch across repartition: got ${got.size}, batch ${batch.size}")
    val cut = firstHalf.last.ts.getTime
    assert(batch.exists(m => m._2 <= cut && m._3 > cut),
      "fixture must contain matches spanning the repartition cut")
  }
}
