package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.fast.FastGraphState
import graft.gen.TranscriptGen
import graft.plan.Planner
import graft.transcripts.TranscriptEdges

/** Per-stage diagnostics for the fast engine's micro-batch pipeline:
  * preloads the bench fixture, streams a few batches, prints every Spark
  * stage's wall time / task count / shuffle volumes. Diagnostics only. */
object FastProf {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val batchSize = if (args.length > 1) args(1).toInt else 1000
    val nBatches = if (args.length > 2) args(2).toInt else 5
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.referenceTracking", "false")
      .config("spark.storage.memoryMapThreshold", "1g")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d => b.config("spark.local.dir", d))
    sys.env.get("SPARK_GRAFT_BYPASS").foreach(v =>
      b.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        System.err.println(
          f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d wall=${ms}%5dms " +
            f"exec=${m.executorRunTime}%6dms ser=${m.resultSerializationTime}%4dms " +
            f"gc=${m.jvmGCTime}%5dms " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB/${m.shuffleWriteMetrics.recordsWritten}%8d " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB/${m.shuffleReadMetrics.recordsRead}%8d  ${si.name}")
      }
    })

    val ts = TranscriptGen.generate(spark, TranscriptGen.Config(sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "20000").toInt, 50, sys.env.getOrElse("SPARK_GRAFT_BENCH_TOOLS", "2000").toInt)).toDF()
    val edges = TranscriptEdges.toolToolEdges(ts).select("src", "dst", "w", "ts")
    val ordered = edges.orderBy("ts", "src", "dst").select("src", "dst", "w").rdd
      .zipWithIndex().map { case (r, i) => (i, r.getLong(0), r.getLong(1), r.getLong(2)) }
    val total = ordered.count()
    val preloadN = (total * 0.9).toLong
    val preload = spark.createDataFrame(
      ordered.filter(_._1 < preloadN).map(t => org.apache.spark.sql.Row(t._2, t._3, t._4)),
      FastGraphState.edgeSchema)
    val streamEdges = ordered.filter(_._1 >= preloadN).map(t => (t._2, t._3, t._4)).collect()

    val state = new FastGraphState(spark, Planner.triangle, numParts = cores)
    state.initialize(preload)
    System.err.println("=== preload done; streaming ===")
    var id = 0L
    for (chunk <- streamEdges.grouped(batchSize).take(nBatches)) {
      val t0 = System.nanoTime()
      val (n, net) = state.applyBatchStats(id, chunk)
      System.err.println(f"[batch] id=$id n=$n net=$net wall=${(System.nanoTime() - t0) / 1e6}%.0fms")
      id += 1
    }
    state.close()
    spark.stop()
  }
}
