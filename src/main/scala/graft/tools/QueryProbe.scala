package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe: runs named SparkEntry queries against a testdata
  * dir and prints wall seconds + row counts (iteration harness for the
  * per-round bench; not part of the driver contract). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("wco_triangle")
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val cnt =
        if (n == "--entry") graft.SparkEntry.entry(spark).count()
        // K=2000 5-clique feasibility probe (the K5=900 graph is 52% dense
        // at sf0.1 — no engine can enumerate it; the K graph at 14% can)
        else if (n == "clique5_dense") graft.fast.FastBatch.enumerate(
          graft.SparkEntry.edges(spark, sfDir), graft.plan.Planner.clique5).count()
        else if (n == "clique5_dense_count") {
          val r = graft.fast.FastBatch.enumerateAgg(
            graft.SparkEntry.edges(spark, sfDir), graft.plan.Planner.clique5).collect()(0)
          println(s"[probe] clique5_dense_count total=${r.getLong(0)}")
          1L
        }
        else graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[probe] $n rep$r: ${(System.nanoTime() - t0) / 1e9}%.1fs ($cnt rows)")
    }
    spark.stop()
  }
}
