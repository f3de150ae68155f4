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
