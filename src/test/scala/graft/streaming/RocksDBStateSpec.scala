package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The RocksDB state backend (StateBackend.withRocksDB) is the scale answer
  * for keyed streaming state that exceeds executor heap — these specs pin
  * that (a) switching backends changes NO emitted row, (b) the switch is
  * non-vacuous (RocksDB custom metrics appear in progress; the session conf
  * is restored after the scope), and (c) a query resumes from a RocksDB
  * changelog checkpoint with state intact and the changelog files actually
  * on disk (incremental O(|batch|) commits, not O(|state|) snapshots). */
class RocksDBStateSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll with SparkTestBase {

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-rocks-$tag").toFile
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

  private def cepEvents = (for {
    key <- 0L until 3L
    i <- 0 until 30
  } yield Patterns.Ev(key, new Timestamp(1700000000000L + i * 1000L),
    key * 1000 + i, Seq("a", "b", "c")(i % 3))).sortBy(e => (e.ts.getTime, e.evId))

  /** Replays `evs` through detectStream into a memory sink, returns
    * (emitted rows, the drained query's recentProgress had rocksdb metrics). */
  private def runCep(name: String): (Set[Seq[Any]], Boolean) = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Patterns.Ev]
    val out = Patterns.detectStream(
      src.toDS().withWatermark("ts", "1 millisecond"), Seq("a", "b", "c"), 10000L)
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val servedByRocks =
      try {
        for (chunk <- cepEvents.grouped(25)) { src.addData(chunk); q.processAllAvailable() }
        src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 1000000L), -1L, "z"))
        q.processAllAvailable()
        src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 2000000L), -2L, "z"))
        q.processAllAvailable()
        import scala.jdk.CollectionConverters._
        q.recentProgress.toIndexedSeq.flatMap(_.stateOperators.toIndexedSeq)
          .flatMap(_.customMetrics.keySet().asScala).exists(_.startsWith("rocksdb"))
      } finally q.stop()
    (spark.table(name).where(col("key") =!= -1L)
      .collect().map(_.toSeq).toSet, servedByRocks)
  }

  test("RocksDB-served fMGWS state matches the default provider exactly") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val (defaultRows, defaultRocks) = runCep("rocks_cep_default")
    assert(!defaultRocks, "control run must NOT be RocksDB-served")
    val (rocksRows, rocksServed) =
      StateBackend.withRocksDB(spark)(runCep("rocks_cep_rocksdb"))
    assert(rocksServed, "RocksDB scope must surface rocksdb custom metrics")
    assert(rocksRows == defaultRows, "backend switch must not change results")
    assert(rocksRows.nonEmpty)
    assert(spark.conf.getOption(providerKey) == before,
      "withRocksDB must restore the provider conf")
  }

  test("requireRocksDBServed rejects a default-provider query") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Patterns.Ev]
    val out = Patterns.detectStream(
      src.toDS().withWatermark("ts", "1 millisecond"), Seq("a", "b"), 10000L)
    val q = out.toDF().writeStream.format("memory").queryName("rocks_gate_neg")
      .outputMode("append").start()
    try {
      src.addData(cepEvents.take(10)); q.processAllAvailable()
      intercept[IllegalArgumentException] { StateBackend.requireRocksDBServed(q) }
    } finally q.stop()
  }

  test("results are identical when state far exceeds the RocksDB memory cap") {
    // the true 10^12-turn regime: working set >> block cache. Bounded
    // memory mode caps block cache + memtables across ALL stores in the
    // executor; a tiny cap forces continuous spill-to-disk reads and the
    // results must not change.
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val confs = Map(
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "4",
      "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB" -> "1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~64k keys × ~200 B values ≈ 13 MB of state against a 4 MB cap
      val n = 65536
      val rows = (0 until n).map(i =>
        (i.toLong, new Timestamp(1700000000000L + i), "x" * 180))
      val src = MemoryStream[(Long, Timestamp, String)]
      val out = StateBackend.withRocksDB(spark) {
        val stream = src.toDF().toDF("event_id", "ts", "pad")
          .withWatermark("ts", "90 days")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"))
        val q = stream.writeStream.format("memory").queryName("rocks_capped")
          .outputMode("append").start()
        try {
          // second delivery of every row exercises reads through the
          // capped cache (each dup must FIND its key in out-of-cache state)
          for (chunk <- (rows ++ rows).grouped(16384))
            { src.addData(chunk); q.processAllAvailable() }
          StateBackend.requireRocksDBServed(q)
        } finally q.stop()
        spark.table("rocks_capped").as[Long].collect()
      }
      assert(out.length == n, s"expected $n deduped ids, got ${out.length}")
      assert(out.toSet == (0L until n.toLong).toSet)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(x => spark.conf.set(k, x))
    }
  }

  test("state change feed replays the dedup working set's construction") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = tmpDir("feed")
    val outDir = tmpDir("feed-out")
    val src = MemoryStream[(Long, Timestamp)]
    val q = src.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "90 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cp).outputMode("append").start()
    val rows = (0L until 60L).map(i => (i, new Timestamp(1700000000000L + i * 1000L)))
    try {
      for (chunk <- rows.grouped(20)) { src.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    // the cross-batch CDC of the state itself: every key appears exactly
    // once as an update, in the batch that first delivered it
    val feed = spark.read.format("statestore")
      .option("readChangeFeed", "true").option("changeStartBatchId", "0")
      .load(cp)
    assert(feed.schema.fieldNames.contains("change_type"))
    val ups = feed.where(col("change_type") === "update")
      .select(col("batch_id"), col("key.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ups.length == 60, s"got ${ups.length} updates")
    assert(ups.map(_._2).toSet == (0L until 60L).toSet)
    // batch attribution matches the delivery schedule (20 keys per batch)
    assert(ups.groupBy(_._1).view.mapValues(_.length).toMap.values.toSet == Set(20))
  }

  test("CEP stream resumes from a RocksDB changelog checkpoint") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = cepEvents
    val steps = Seq("a", "b", "c")
    val span = 10000L
    val src = MemoryStream[Patterns.Ev]
    val cp = tmpDir("cep")
    val outDir = tmpDir("cep-out")
    def start() =
      Patterns.detectStream(src.toDS().withWatermark("ts", "1 millisecond"), steps, span)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    StateBackend.withRocksDB(spark) {
      val q1 = start()
      src.addData(evs.take(40))
      q1.processAllAvailable()
      q1.stop()

      // changelog checkpointing must have actually engaged: the state
      // checkpoint carries .changelog delta files, not only full snapshots
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).iterator.flatten.flatMap(walk)
        else Iterator(f)
      val stateDir = new java.io.File(cp, "state")
      assert(walk(stateDir).exists(_.getName.endsWith(".changelog")),
        "expected RocksDB changelog files under the state checkpoint")

      val q2 = start()
      src.addData(evs.drop(40))
      src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 1000000L), -1L, "z"))
      q2.processAllAvailable()
      src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 2000000L), -2L, "z"))
      q2.processAllAvailable()
      StateBackend.requireRocksDBServed(q2)
      q2.stop()
    }

    val streamed = spark.read.parquet(outDir)
      .where(col("key") =!= -1L)
      .collect().map(_.toSeq).toSeq
    assert(streamed.distinct.size == streamed.size, "restart must not duplicate matches")
    val rows = evs.map(e => (e.key, e.ts, e.evId, e.tag))
      .toDF("key", "ts", "ev_id", "tag")
    val batch = Patterns.detectBatch(rows, steps, span)
      .select(col("key"), col("start_ts").as("startTs"), col("end_ts").as("endTs"),
        col("start_id").as("startId"))
      .collect().map(_.toSeq).toSeq
    assert(streamed.toSet == batch.toSet,
      "post-restart union must equal the batch form (state crossed the restart)")
    assert(batch.nonEmpty)
  }
}
