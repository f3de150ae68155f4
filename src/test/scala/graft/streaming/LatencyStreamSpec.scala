package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the O(1)-state latency kernel to the batch gap aggregates: same
  * (n, min, max, sum) per conversation under (a) chunked ts-ordered
  * delivery, (b) within-batch shuffled delivery (the kernel must restore
  * turn order inside a micro-batch itself), and (c) one-turn-per-batch
  * stress. A single-turn conversation must emit nothing (no gaps). */
class LatencyStreamSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L

  private def turn(c: String, i: Int, ms: Long): LatencyStream.Turn =
    LatencyStream.Turn(c, i, new Timestamp(base + ms))

  // 5 convs × 7 turns with conversation-specific, non-uniform gaps, plus a
  // single-turn conversation that must not appear in the output
  private val all: Seq[LatencyStream.Turn] = {
    val multi = for (c <- Seq("a", "b", "c", "d", "e"); i <- 1 to 7)
      yield turn(c, i, i.toLong * i * 13000L + (c.hashCode % 997) * 17L)
    multi :+ turn("solo", 1, 99000L)
  }

  private def expected: Map[String, (Long, Long, Long, Long)] =
    all.groupBy(_.convId).collect { case (c, ts) if ts.size > 1 =>
      val us = ts.sortBy(_.turnIdx).map(_.ts.getTime * 1000L)
      val gaps = us.zip(us.tail).map { case (p, n) => n - p }
      c -> ((gaps.size.toLong, gaps.min, gaps.max, gaps.sum))
    }

  private def run(batches: Seq[Seq[LatencyStream.Turn]]): Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[LatencyStream.Turn]
    val out = LatencyStream.latencyStream(
      src.toDS().withWatermark("ts", "30 minutes"), gapMs = 60000L).toDF()
    val name = s"graft_lat_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val far = all.map(_.ts.getTime).max + 3600000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(LatencyStream.Turn("~s", 1, new Timestamp(far + 1800000L + off)))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).where(col("conv_id") =!= "~s").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  private val tsOrdered = all.sortBy(t => (t.ts.getTime, t.convId))

  test("stream == batch latency aggregates: chunked ts-ordered delivery") {
    assert(run(tsOrdered.grouped(9).toSeq) == expected)
  }

  test("within-batch disorder is restored by the kernel's per-batch sort") {
    // one batch per conversation, rows shuffled inside it — the contract
    // only requires CROSS-batch monotonicity, which trivially holds here
    val byConv = all.groupBy(_.convId).values.toSeq.sortBy(_.head.convId)
    val shuffled = byConv.map(b => b.sortBy(t => t.turnIdx * 7919 % 13))
    assert(run(shuffled) == expected)
  }

  test("one turn per micro-batch (timeouts armed between every arrival)") {
    assert(run(tsOrdered.map(Seq(_))) == expected)
  }
}
