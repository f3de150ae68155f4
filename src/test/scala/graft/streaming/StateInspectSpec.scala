package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Offline state introspection via Spark's statestore / state-metadata
  * data sources: a production 10^12-turn deployment must be able to audit
  * a running job's keyed state from the checkpoint WITHOUT stopping the
  * query. Pins that the dedup operator's state read back from the
  * checkpoint equals the exact key set the semantics imply. */
class StateInspectSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll with SparkTestBase {

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-si-$tag").toFile
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

  test("dedup state read back from checkpoint == the seen key set") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp)]
    val cp = tmpDir("cp")
    val outDir = tmpDir("out")
    val out = src.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "90 days")
      .dropDuplicatesWithinWatermark("event_id")
    val q = out.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cp).outputMode("append").start()
    val rows = (0L until 100L).map(i =>
      (i, new Timestamp(1700000000000L + i * 1000L)))
    try {
      for (chunk <- rows.grouped(25)) { src.addData(chunk); q.processAllAvailable() }
    } finally q.stop()

    // operator metadata: the dedup operator is discoverable by name with a
    // readable batch range
    val meta = StateInspect.metadata(spark, cp)
      .select("operatorName", "stateStoreName", "maxBatchId").collect()
    assert(meta.exists(r => r.getString(0).toLowerCase.contains("dedup")
      && r.getLong(2) >= 0L), s"metadata rows: ${meta.mkString(";")}")

    // raw store: dedup value carries the watermark-eviction deadline
    val st = StateInspect.store(spark, cp)
    assert(st.schema.fieldNames.toSet == Set("key", "value", "partition_id"))
    assert(st.select(col("value.expiresAtMicros")).where(col("expiresAtMicros").isNull)
      .count() == 0, "every retained key must carry an expiry")

    val keys = StateInspect.dedupKeys(spark, cp, "event_id").as[Long]
      .collect().toSet
    assert(keys == (0L until 100L).toSet)

    // the skew audit sums to the key count
    val hist = StateInspect.partitionHistogram(spark, cp)
    assert(hist.agg(sum("count")).head().getLong(0) == 100L)
  }

  test("TWS column families and timers are auditable from the checkpoint") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = tmpDir("tws-cp")
    val outDir = tmpDir("tws-out")
    // 2 keys × an open a→b→c prefix whose tail stays pending (span large,
    // watermark held back by design), so buf/seen/timers are all non-empty
    val evs = (for {
      key <- 0L until 2L
      i <- 0 until 9
    } yield Patterns.Ev(key, new Timestamp(1700000000000L + i * 1000L),
      key * 100 + i, Seq("a", "b", "c")(i % 3)))
    StateBackend.withRocksDB(spark) {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Patterns.Ev]
      val q = PatternsTws.detectStream(
          src.toDS().withWatermark("ts", "1 millisecond"), Seq("a", "b", "c"), 60000L)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()
      try { src.addData(evs); q.processAllAvailable() } finally q.stop()
    }

    // buf MapState (evId-keyed since round 6): one row per buffered event,
    // key preserved
    val buf = StateInspect.stateVar(spark, cp, "buf")
    val bufRows = buf.select(col("key.value").as("key")).collect().map(_.getLong(0))
    assert(bufRows.length > 0 && bufRows.toSet == Set(0L, 1L),
      s"buf audit rows: ${bufRows.length}")
    // minTs ValueState: the read-gate summary, one row per pending key
    val minTs = StateInspect.stateVar(spark, cp, "minTs")
    assert(minTs.select(col("key.value")).collect().map(_.getLong(0)).toSet
      == Set(0L, 1L), "minTs must carry one gate row per pending key")
    // each pending key re-armed exactly one event-time timer
    val timers = StateInspect.timers(spark, cp)
    assert(timers.select(col("key.value")).collect().map(_.getLong(0)).toSet
      == Set(0L, 1L))
  }
}
