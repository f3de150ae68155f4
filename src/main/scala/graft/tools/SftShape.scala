package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SftStream, SftTws, StateBackend}
import graft.streaming.SftStream.Turn

/** State-write-amplification A/B for the SFT pair-extraction kernels —
  * the same measurement [[TwsShape]] makes for CEP, on the newest
  * stateful operator: the fMGWS form (per-key state is ONE serialized
  * blob, rewritten wholesale every time the conversation's batch
  * arrives) vs the transformWithState form (`pend` ListState O(1)
  * appends; list rewritten only when the watermark seals entries), both
  * on RocksDB with changelog checkpointing so only the write pattern
  * differs.
  *
  * Fixture: `convs` conversations × `perConv` turns with a watermark
  * delay longer than the stream, so NOTHING seals until the closing
  * sentinels — per-conv pending buffers grow linearly to `perConv`,
  * the long-lived-conversation regime the TWS form targets. Delivered
  * in `batches` micro-batches, every batch touching EVERY conversation.
  * Prints totals + a between-forms pair-set equality check; numbers
  * feed BASELINE.md. */
object SftShape {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.stateSchemaCheck", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val convs = args.headOption.map(_.toInt).getOrElse(64)
    val perConv = if (args.length > 1) args(1).toInt else 2048
    val batches = if (args.length > 2) args(2).toInt else 32
    val base = 1700000000000L
    val stepMs = 1000L

    val turns = (0 until perConv).flatMap { i =>
      (0 until convs).map { k =>
        Turn(s"c$k", i + 1, if (i % 2 == 0) "user" else "assistant",
          s"t$i-$k", new Timestamp(base + i * stepMs))
      }
    }
    // grouped(0) throws before any measurement when batches > total rows
    val chunkRows = math.max(1, turns.length / batches)

    def run(tag: String, tws: Boolean): (Long, Double, Seq[Double], Long) = {
      val mem = MemoryStream[Turn]
      val in = mem.toDS().withWatermark("ts", "90 days")
      val out = (if (tws) SftTws.sftStream(in, "assistant", ctxTurns = 4)
                 else SftStream.sftStream(in, "assistant", ctxTurns = 4)).toDF()
      val cp = java.nio.file.Files.createTempDirectory(s"sft-shape-$tag")
      val q = out.writeStream.format("memory").queryName(s"sft_shape_$tag")
        .option("checkpointLocation", cp.toString)
        .outputMode("append").start()
      val perBatch = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      try {
        for (chunk <- turns.grouped(chunkRows)) {
          val b0 = System.nanoTime()
          mem.addData(chunk); q.processAllAvailable()
          perBatch += (System.nanoTime() - b0) / 1e9
        }
        val far = base + perConv * stepMs + 90L * 86400000L + 7200000L
        mem.addData(Turn("~s", 1, "", "", new Timestamp(far)))
        q.processAllAvailable()
        mem.addData(Turn("~s", 2, "", "", new Timestamp(far + 1000L)))
        q.processAllAvailable()
      } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = spark.table(s"sft_shape_$tag")
        .where(org.apache.spark.sql.functions.col("conv_id") =!= "~s").count()
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(walk)
        else Iterator(f)
      val stateBytes = walk(new java.io.File(cp.toFile, "state"))
        .filter(f => f.getName.endsWith(".changelog") || f.getName.endsWith(".zip")
          || f.getName.endsWith(".snapshot") || f.getName.endsWith(".delta"))
        .map(_.length()).sum
      walk(cp.toFile).foreach(_.delete())
      (n, sec, perBatch.toSeq, stateBytes)
    }

    StateBackend.withRocksDB(spark) {
      println(s"[sft-shape] warmup ...")
      run("w1", tws = false); run("w2", tws = true)
      val (nF, secF, pbF, bytesF) = run("fmgws", tws = false)
      val (nT, secT, pbT, bytesT) = run("tws", tws = true)
      require(nF == nT, s"result mismatch: fMGWS=$nF tws=$nT")
      def fmt(xs: Seq[Double]) =
        xs.grouped(math.max(1, xs.length / 8)).map(g =>
          f"${g.sum / g.size}%.3f").mkString(" ")
      println(f"[sft-shape] convs=$convs perConv=$perConv batches=$batches pairs=$nF")
      println(f"[sft-shape] fMGWS  total=${secF}%.2f s  state-ckpt=${bytesF / 1048576.0}%.1f MiB  per-batch(8 buckets)=${fmt(pbF)}")
      println(f"[sft-shape] TWS    total=${secT}%.2f s  state-ckpt=${bytesT / 1048576.0}%.1f MiB  per-batch(8 buckets)=${fmt(pbT)}")
      println(f"[sft-shape] checkpoint-bytes ratio fMGWS/TWS = ${bytesF.toDouble / math.max(1L, bytesT)}%.2f")
      def growth(xs: Seq[Double]) = {
        val k = math.max(1, xs.length / 4)
        xs.takeRight(k).sum / math.max(1e-9, xs.take(k).sum)
      }
      println(f"[sft-shape] late/early cost ratio: fMGWS=${growth(pbF)}%.2f TWS=${growth(pbT)}%.2f")
    }
    spark.stop()
    sys.exit(0)
  }
}
