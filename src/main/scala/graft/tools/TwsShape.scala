package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Patterns, PatternsTws, StateBackend}
import graft.streaming.Patterns.Ev

/** State-write-amplification A/B for the CEP kernels: the fMGWS form
  * (ONE serialized blob per key — every micro-batch rewrites each touched
  * key's ENTIRE buffer) vs the transformWithState form (ListState O(1)
  * appends + MapState O(1) dedup; list rewritten only on watermark
  * eviction), both on RocksDB so the state-backend serialization cost is
  * identical and only the write pattern differs.
  *
  * Fixture: `keys` keys × `perKey` events, in-order, pattern span chosen so
  * NOTHING evicts until a final flush — per-key buffers grow linearly to
  * `perKey`, which is exactly the long-lived-key regime the TWS form
  * targets (a 10^12-turn conversation key never stops accumulating).
  * Delivered in `batches` micro-batches; per-form totals are printed with
  * per-buffer-size growth, plus a result-equality check between forms.
  * Numbers feed BASELINE.md. */
object TwsShape {
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

    val keys = args.headOption.map(_.toInt).getOrElse(64)
    val perKey = if (args.length > 1) args(1).toInt else 2048
    val batches = if (args.length > 2) args(2).toInt else 32
    val steps = Seq("a", "b", "c")
    // span >= the whole event range: no eviction while streaming (the
    // worst-case buffer-growth regime); the final flush closes everything
    val stepMs = 1000L
    val spanMs = perKey * stepMs + 1000000L

    // in-order interleaved delivery: every batch touches EVERY key with
    // perKey/batches new events (the per-invocation blob rewrite is then
    // O(buffer) for fMGWS vs O(chunk) appends for TWS)
    val evs = (0 until perKey).flatMap { i =>
      (0 until keys).map { k =>
        Ev(k.toLong, new Timestamp(1700000000000L + i * stepMs),
          i.toLong * keys + k, steps(i % steps.size))
      }
    }
    val chunkRows = evs.length / batches

    def run(tag: String, tws: Boolean): (Long, Double, Seq[Double], Long) = {
      val mem = MemoryStream[Ev]
      val in = mem.toDS().withWatermark("ts", "1 millisecond")
      val out = if (tws) PatternsTws.detectStream(in, steps, spanMs).toDF()
                else Patterns.detectStream(in, steps, spanMs).toDF()
      // real checkpoint: the state changelog bytes are the claim under test
      val cp = java.nio.file.Files.createTempDirectory(s"tws-shape-$tag")
      val q = out.writeStream.format("memory").queryName(s"tws_shape_$tag")
        .option("checkpointLocation", cp.toString)
        .outputMode("append").start()
      val perBatch = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      try {
        for (chunk <- evs.grouped(chunkRows)) {
          val b0 = System.nanoTime()
          mem.addData(chunk); q.processAllAvailable()
          perBatch += (System.nanoTime() - b0) / 1e9
        }
        val far = 1700000000000L + perKey * stepMs + spanMs + 1000000L
        mem.addData(Ev(-1L, new Timestamp(far), -1L, "z")); q.processAllAvailable()
        mem.addData(Ev(-1L, new Timestamp(far + 1000L), -2L, "z")); q.processAllAvailable()
      } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = spark.table(s"tws_shape_$tag").count()
      // total state-checkpoint bytes shipped (changelogs + snapshots) —
      // on a real cluster this is DFS write traffic per commit
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
      // warm both paths once (codegen + RocksDB JNI load), then measure
      println(s"[tws-shape] warmup ...")
      run("w1", tws = false); run("w2", tws = true)
      val (nF, secF, pbF, bytesF) = run("fmgws", tws = false)
      val (nT, secT, pbT, bytesT) = run("tws", tws = true)
      require(nF == nT, s"result mismatch: fMGWS=$nF tws=$nT")
      def fmt(xs: Seq[Double]) =
        xs.grouped(math.max(1, xs.length / 8)).map(g =>
          f"${g.sum / g.size}%.3f").mkString(" ")
      println(f"[tws-shape] keys=$keys perKey=$perKey batches=$batches matches=$nF")
      println(f"[tws-shape] fMGWS  total=${secF}%.2f s  state-ckpt=${bytesF / 1048576.0}%.1f MiB  per-batch(8 buckets)=${fmt(pbF)}")
      println(f"[tws-shape] TWS    total=${secT}%.2f s  state-ckpt=${bytesT / 1048576.0}%.1f MiB  per-batch(8 buckets)=${fmt(pbT)}")
      println(f"[tws-shape] checkpoint-bytes ratio fMGWS/TWS = ${bytesF.toDouble / math.max(1L, bytesT)}%.2f")
      // growth diagnostic: late-batch cost / early-batch cost (buffers are
      // ~batches× larger at the end; a flat ratio means O(1) per event)
      def growth(xs: Seq[Double]) = {
        val k = math.max(1, xs.length / 4)
        xs.takeRight(k).sum / math.max(1e-9, xs.take(k).sum)
      }
      println(f"[tws-shape] late/early cost ratio: fMGWS=${growth(pbF)}%.2f TWS=${growth(pbT)}%.2f")
    }
    spark.stop()
    sys.exit(0)
  }
}
