package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-JVM sanity probe for Spark's `local-cluster[N,cores,memMB]` master:
  * separate executor processes with their own block managers on one box —
  * the testbed that can distinguish "single-JVM block-manager funnel" from a
  * real algorithmic scaling limit (the 8→32 step question from BENCH_r03).
  * Requires SPARK_HOME (the /opt/spark dist) and the compiled graft classes
  * on spark.executor.extraClassPath. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local-cluster[2,2,2048]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-probe")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // exercise a real shuffle + a graft fast-engine batch job across executors
      val sc = spark.sparkContext
      val n = sc.parallelize(1 to 100000, 16)
        .map(i => (i % 97, i.toLong)).reduceByKey(_ + _).count()
      println(s"[cluster] shuffle groups=$n")
      val execs = sc.getExecutorMemoryStatus.keySet
      println(s"[cluster] executors=${execs.size} -> ${execs.mkString(", ")}")
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val rnd = new scala.util.Random(3L)
      import scala.jdk.CollectionConverters._
      val edges = spark.createDataFrame(
        (0 until 4000).map { _ =>
          Row(rnd.nextInt(300).toLong, rnd.nextInt(300).toLong, 1L)
        }.asJava,
        StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
          StructField("w", LongType)))).where("src <> dst")
      val tri = graft.fast.FastBatch.enumerateAgg(edges, graft.plan.Planner.triangle)
        .collect()(0)
      println(s"[cluster] fast-engine triangles n=${tri.getLong(0)} total=${tri.getLong(1)}")
      println("[cluster] PASS")
    } finally spark.stop()
  }
}
