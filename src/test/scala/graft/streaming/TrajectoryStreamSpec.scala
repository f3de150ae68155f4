package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the streaming trajectory kernel to the batch assembly: identical
  * '|'-joined action sequences per conversation under (a) multi-batch
  * delivery, (b) a held-back late cohort delivered after its successors,
  * and (c) one-turn-per-micro-batch stress. */
class TrajectoryStreamSpec extends AnyFunSuite with SparkTestBase {

  private def turn(c: Long, tie: Long, a: String, ms: Long): TrajectoryStream.TTurn =
    TrajectoryStream.TTurn(c, tie, a, new Timestamp(1767225600000L + ms))

  // 5 convs × 6 turns interleaved in time; action encodes (conv, idx)
  private val all: Seq[TrajectoryStream.TTurn] =
    for (i <- 1 to 6; c <- 1L to 5L)
      yield turn(c, c * 100 + i, s"a$i", i * 60000L + c * 37L)

  private def expected: Map[Long, String] =
    all.groupBy(_.conv).map { case (c, ts) =>
      c -> ts.sortBy(t => (t.ts.getTime, t.tie)).map(_.action).mkString("|")
    }

  private def run(batches: Seq[Seq[TrajectoryStream.TTurn]]): Map[Long, String] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[TrajectoryStream.TTurn]
    val out = TrajectoryStream.trajStream(
      src.toDS().withWatermark("ts", "30 minutes"), gapMs = 60000L).toDF()
    val name = s"graft_tsr_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val far = all.map(_.ts.getTime).max + 3600000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(turn(-1L, 0L, "", far - 1767225600000L + 1800000L + off))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).where(col("conv_id") =!= -1L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("stream == batch trajectories: multi-batch with a late cohort") {
    val (late, onTime) = all.partition(_.tie % 3 == 2)
    val got = run(onTime.grouped(7).toSeq ++ Seq(late))
    assert(got == expected)
  }

  test("stream == batch trajectories: one turn per micro-batch") {
    val got = run(all.sortBy(t => (t.ts.getTime, t.conv)).map(Seq(_)))
    assert(got == expected)
  }

  test("labelGroups on the streamed table equals batch dedup") {
    import spark.implicits._
    val streamed = run(Seq(all)).toSeq.toDF("conv_id", "traj")
    val batch = graft.transcripts.Trajectories.dedup(
      all.map(t => (t.conv, t.tie, t.action, t.ts.getTime)).toDF("conv", "tie", "action", "ms"),
      "conv", "action", col("ms"), col("tie"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = graft.transcripts.Trajectories.labelGroups(streamed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
  }
}
