package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the mechanics the dedup_turns_stream driver gate relies on:
  * dropDuplicatesWithinWatermark removes BOTH in-batch and cross-batch
  * redeliveries while the duplicate lands inside the watermark window —
  * and the fixture is non-vacuous (the same schedule without the dedup
  * node emits strictly more rows). */
object DedupTurnsStreamSpec {
  final case class Ev(event_id: Long, ts: Timestamp)
}

class DedupTurnsStreamSpec extends AnyFunSuite with SparkTestBase {
  import DedupTurnsStreamSpec.Ev
  private def ts(m: Long) = new Timestamp(1767225600000L + m * 60000L)

  private def run(dedup: Boolean): Seq[Long] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val base = src.toDS().toDF().withWatermark("ts", "1 hour")
    val out = (if (dedup) base.dropDuplicatesWithinWatermark("event_id") else base)
      .select(col("event_id"))
    val name = s"graft_ddwspec_${dedup}_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: ids 1,2,3 with 2 duplicated IN-batch
      src.addData(Ev(1, ts(0)), Ev(2, ts(1)), Ev(2, ts(1)), Ev(3, ts(2)))
      q.processAllAvailable()
      // batch 2: id 4 plus a CROSS-batch redelivery of 1 and 3 (well inside
      // the 1h watermark window)
      src.addData(Ev(4, ts(3)), Ev(1, ts(0)), Ev(3, ts(2)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("in-batch and cross-batch redeliveries are dropped; fixture non-vacuous") {
    assert(run(dedup = true) == Seq(1L, 2L, 3L, 4L))
    val raw = run(dedup = false)
    assert(raw.size == 7 && raw != Seq(1L, 2L, 3L, 4L))
  }
}
