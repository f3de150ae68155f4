package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The SS-side metrics journal must leave a parseable on-disk trail: one
  * JSON line per completed micro-batch with input rows, per-operator state
  * rows and (under RocksDB) rocksdb metrics — and the trail must itself be
  * loadable by the engine (it is jsonl). */
class MetricsJournalSpec extends AnyFunSuite with SparkTestBase {

  test("per-batch state metrics land in the journal, parseable as jsonl") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempFile("graft-mj", ".jsonl")
    java.nio.file.Files.delete(path)
    val rows = (0L until 40L).map(i => (i, new Timestamp(1700000000000L + i * 1000L)))
    MetricsJournal.journaled(spark, path.toString) {
      StateBackend.withRocksDB(spark) {
        val src = MemoryStream[(Long, Timestamp)]
        val q = src.toDF().toDF("event_id", "ts")
          .withWatermark("ts", "90 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.format("memory").queryName("mj_dedup")
          .outputMode("append").start()
        try {
          for (chunk <- rows.grouped(10)) { src.addData(chunk); q.processAllAvailable() }
        } finally q.stop()
        // listener bus is async: wait for the last batch's line to land
        val deadline = System.nanoTime() + 10_000_000_000L
        while (System.nanoTime() < deadline &&
            (!java.nio.file.Files.exists(path) ||
             java.nio.file.Files.readAllLines(path).size() < 4)) Thread.sleep(50)
      }
    }
    // the journal is data: load it with the engine itself
    val j = spark.read.json(path.toString)
    assert(j.count() >= 4, "expected one line per data micro-batch")
    val batches = j.selectExpr("batchId", "inputRows",
        "aggregate(state, 0L, (a, s) -> a + s.rows) AS state_rows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batches.map(_._2).sum == 40L, s"input rows: ${batches.mkString(",")}")
    // state grows monotonically to the full key count (nothing evicts)
    assert(batches.maxBy(_._1)._3 == 40L)
    // rocksdb metrics surfaced per operator
    assert(j.selectExpr("aggregate(state, 0L, (a, s) -> a + s.rocksdbBytesWritten)")
      .collect().map(_.getLong(0)).sum > 0L, "rocksdb write bytes must appear")
    java.nio.file.Files.delete(path)
  }
}
