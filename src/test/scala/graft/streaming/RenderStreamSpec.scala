package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the streaming render kernel to the batch render: same documents
  * for every conversation under (a) multi-batch delivery, (b) a late
  * cohort delivered after its successors, and (c) one-turn-per-micro-batch
  * stress (timeouts armed between every pair of arrivals must not emit
  * early, because the watermark delay still covers the stream). */
class RenderStreamSpec extends AnyFunSuite with SparkTestBase {

  private def turn(c: String, i: Int, ms: Long): RenderStream.Turn =
    RenderStream.Turn(c, i, s"$c-p$i", new Timestamp(1767225600000L + ms))

  // 6 convs × 8 turns, interleaved in time; piece text encodes (conv, idx)
  private val all: Seq[RenderStream.Turn] =
    for (i <- 1 to 8; c <- Seq("a", "b", "c", "d", "e", "f"))
      yield turn(c, i, i * 60000L + c.hashCode % 997)

  private def expected: Map[String, (Long, String)] =
    all.groupBy(_.convId).map { case (c, ts) =>
      val s = ts.sortBy(_.turnIdx)
      c -> (s.size.toLong, s.map(_.piece).mkString("\n"))
    }

  private def run(batches: Seq[Seq[RenderStream.Turn]]): Map[String, (Long, String)] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[RenderStream.Turn]
    val out = RenderStream.renderStream(
      src.toDS().withWatermark("ts", "30 minutes"), gapMs = 60000L).toDF()
    val name = s"graft_rsr_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val far = all.map(_.ts.getTime).max + 3600000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(RenderStream.Turn("~s", 1, "",
          new Timestamp(far + 1800000L + off)))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).where(col("conv_id") =!= "~s").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
  }

  test("stream == batch render: multi-batch with a held-back late cohort") {
    val (late, onTime) = all.partition(_.turnIdx % 3 == 2)
    val got = run(onTime.grouped(9).toSeq ++ Seq(late))
    assert(got == expected)
  }

  test("stream == batch render: one turn per micro-batch") {
    val got = run(all.sortBy(t => (t.ts.getTime, t.convId)).map(Seq(_)))
    assert(got == expected)
  }
}
