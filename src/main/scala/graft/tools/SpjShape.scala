package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-partitioned-join A/B on the derived edge graph: the same
  * fwd-join-rev aggregate over (1) the bucketed tables with
  * `spark.sql.sources.v2.bucketing.enabled` OFF — Spark shuffles both
  * sides — and (2) ON — the key-grouped scans join and aggregate with
  * zero exchanges. Broadcast is disabled in both regimes so the shuffle
  * is really on the line. Prints wall times (median of reps), the
  * planned exchange counts, and a result-equality gate; numbers feed
  * BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.tools.SpjShape [buckets] [reps]" */
object SpjShape {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val buckets = args.headOption.map(_.toInt).getOrElse(32)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_spjshape_wh"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), new org.apache.hadoop.conf.Configuration())
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.gsp",
      classOf[graft.sources.v2.EdgeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.warehouse", wh)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // load once: both regimes read the SAME bucketed tables, so the A/B
    // isolates the exchange, not the write path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp.db")
    spark.sql("CREATE TABLE gsp.db.fwd (src BIGINT, dst BIGINT, w BIGINT)")
    spark.sql("CREATE TABLE gsp.db.rev (src BIGINT, dst BIGINT, w BIGINT)")
    val edges = graft.SparkEntry.edges(spark, dir).withColumn("w", lit(1L))
    edges.writeTo("gsp.db.fwd").option("buckets", s"$buckets,src").append()
    edges.selectExpr("dst AS src", "src AS dst", "w")
      .writeTo("gsp.db.rev").option("buckets", s"$buckets,src").append()
    val nEdges = spark.table("gsp.db.fwd").count()

    def query: DataFrame = spark.table("gsp.db.fwd").alias("f")
      .join(spark.table("gsp.db.rev").alias("r"), "src")
      .groupBy("src")
      .agg(count(lit(1)).as("pairs"),
        sum(col("f.dst") + col("r.dst")).as("sum_dd"))

    // AQE wraps the plan in a leaf AdaptiveSparkPlanExec AND nests the
    // final tree inside leaf QueryStageExec wrappers, so a tree collect
    // sees zero exchanges for every query; count them in the rendered
    // final plan instead
    def shuffleCount(df: DataFrame): Long = {
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      "Exchange (hash|range)partitioning".r.findAllIn(p.toString).length.toLong
    }

    def run(tag: String, spj: Boolean): (Double, Long, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        query.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val df = query
      val shuffles = shuffleCount(df)
      val rows = df.count()
      val med = walls(walls.length / 2)
      println(f"[spj] $tag%-10s median=$med%7.3fs reps=${walls.map(w => f"$w%.3f").mkString(",")} " +
        s"exchanges=$shuffles groups=$rows")
      (med, shuffles, rows)
    }

    println(s"[spj] fixture: $nEdges edges per side, buckets=$buckets, " +
      s"cores=$cpus, sf=$dir")
    val (wOff, exOff, nOff) = run("shuffled", spj = false)
    val (wOn, exOn, nOn) = run("spj", spj = true)
    require(nOff == nOn, s"group counts diverged: $nOff vs $nOn")
    require(exOn == 0, s"SPJ plan must carry zero exchanges, got $exOn")
    require(exOff > 0, "the shuffled baseline lost its exchanges — A/B is vacuous")
    println(f"[spj] speedup=${wOff / wOn}%.2fx (shuffled $wOff%.3fs -> spj $wOn%.3fs)")
    spark.stop()
    sys.exit(0)
  }
}
