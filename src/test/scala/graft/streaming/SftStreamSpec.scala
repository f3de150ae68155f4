package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.transcripts.TranscriptDocs

/** Pins the incremental streaming SFT-pair kernel to the batch lag-window
  * gate: same (prompt, completion) pairs under multi-batch delivery, a
  * held-back late cohort, and one-turn-per-micro-batch stress — plus the
  * property that distinguishes it from RenderStream: with a tight
  * watermark delay, pairs EMIT while conversations are still open (the
  * sealed-prefix path), not only at the closing timeout. */
class SftStreamSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L

  private def turn(c: String, i: Int, ms: Long): SftStream.Turn =
    SftStream.Turn(c, i, if (i % 2 == 0) "assistant" else "user",
      s"$c-t$i", new Timestamp(base + ms))

  // 4 convs × 9 turns spread over ~18 min; assistant on even turns
  private val all: Seq[SftStream.Turn] =
    for (i <- 1 to 9; c <- Seq("a", "b", "c", "d"))
      yield turn(c, i, i * 120000L + (c.hashCode % 997))

  private def batchExpected: Set[(String, Long, String, String)] = {
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(
      all.map(t => Row(t.convId, t.turnIdx, t.role, t.text)).asJava,
      StructType(Seq(
        StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
        StructField("role", StringType), StructField("text", StringType))))
    TranscriptDocs.sftPairs(d, "assistant", ctxTurns = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
  }

  /** Replays `batches`; returns (rows observed BEFORE the closing
    * sentinels, rows at the end). */
  private def run(batches: Seq[Seq[SftStream.Turn]], delay: String)
      : (Set[(String, Long, String, String)], Set[(String, Long, String, String)]) = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[SftStream.Turn]
    val out = SftStream.sftStream(
      src.toDS().withWatermark("ts", delay),
      targetRole = "assistant", ctxTurns = 4, gapMs = 60000L).toDF()
    val name = s"graft_sft_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def snap() = spark.table(name).where(col("conv_id") =!= "~s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val mid = snap()
      // push the watermark PAST every armed timeout (lastMs + gapMs):
      // sentinel ts = max + delay + 2 h, so wm reaches max + 2 h
      val delayMs = if (delay == "90 days") 90L * 86400000L else 180000L
      val far = all.map(_.ts.getTime).max + delayMs + 7200000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(SftStream.Turn("~s", 1, "", "", new Timestamp(far + off)))
        q.processAllAvailable()
      }
      (mid, snap())
    } finally q.stop()
  }

  test("stream == batch pairs: multi-batch with a held-back late cohort") {
    // 90-day delay: the late cohort is never beyond the watermark
    val (late, onTime) = all.partition(_.turnIdx % 3 == 2)
    val (_, end) = run(onTime.grouped(7).toSeq ++ Seq(late), "90 days")
    assert(end == batchExpected)
  }

  test("stream == batch pairs: one turn per micro-batch") {
    val (_, end) = run(
      all.sortBy(t => (t.ts.getTime, t.convId)).map(Seq(_)), "90 days")
    assert(end == batchExpected)
  }

  test("TWS kernel == batch pairs (shared drain, column-family state)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val got = StateBackend.withRocksDB(spark) {
      val src = MemoryStream[SftStream.Turn]
      val out = SftTws.sftStream(
        src.toDS().withWatermark("ts", "90 days"),
        targetRole = "assistant", ctxTurns = 4, gapMs = 60000L).toDF()
      val name = s"graft_sfttws_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val (late, onTime) = all.partition(_.turnIdx % 3 == 2)
        (onTime.grouped(7).toSeq ++ Seq(late)).foreach { b =>
          src.addData(b); q.processAllAvailable()
        }
        val far = all.map(_.ts.getTime).max + 90L * 86400000L + 7200000L
        for (off <- Seq(0L, 1000L)) {
          src.addData(SftStream.Turn("~s", 1, "", "", new Timestamp(far + off)))
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).where(col("conv_id") =!= "~s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
    }
    assert(got == batchExpected)
  }

  test("incremental emission: sealed-prefix pairs emit before any timeout") {
    // 3-minute delay over an 18-minute in-order stream: the watermark
    // passes early turns while conversations are still open, so their
    // pairs must be on the sink BEFORE the closing sentinels — the
    // state-pruning path RenderStream cannot take
    val ordered = all.sortBy(t => (t.ts.getTime, t.convId))
    val (mid, end) = run(ordered.grouped(4).toSeq, "3 minutes")
    assert(mid.nonEmpty,
      "no pairs emitted mid-stream: the sealed-prefix path never ran")
    assert(end == batchExpected)
    assert(mid.subsetOf(end))
  }
}
