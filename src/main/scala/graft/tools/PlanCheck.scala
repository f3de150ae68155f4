package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.batch.{EdgeIndex, GenericJoin}
import graft.gen.TranscriptGen
import graft.plan.Planner
import graft.transcripts.TranscriptEdges

/** Micro-profiles one delta batch phase by phase, to locate per-batch cost.
  * args: [aqe] [routing] [nTools] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val routing = args.length < 2 || args(1) == "true"
    val nTools = if (args.length > 2) args(2).toInt else 500
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("GRAFT_BC", (64L * 1024 * 1024).toString))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ts = TranscriptGen.generate(spark, TranscriptGen.Config(2000, 50, nTools)).toDF()
    val all = TranscriptEdges.toolToolEdges(ts).select("src", "dst", "w").cache()
    val n = all.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e6}%.0f ms"); r
    }
    val base = t("base consolidate+persist") {
      val b = EdgeIndex.consolidate(all.limit((n * 0.9).toInt)).persist(); b.count(); b
    }
    val degF = EdgeIndex.degrees(base, true).persist(); degF.count()
    val degR = EdgeIndex.degrees(base, false).persist(); degR.count()
    val rest = all.collect().takeRight(2000)
    val schema = StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
      StructField("w", LongType)))
    for (round <- 0 until 2) {
      val chunk = rest.slice(round * 1000, round * 1000 + 1000)
      val delta = t("delta persist") {
        val d = spark.createDataFrame(java.util.Arrays.asList(
          chunk.map(r => Row(r.getLong(0), r.getLong(1), r.getLong(2))): _*), schema).persist()
        d.count(); d
      }
      val oldIdx = EdgeIndex(
        base.select(col("src").as("k"), col("dst").as("v"), col("w").as("ew")),
        base.select(col("dst").as("k"), col("src").as("v"), col("w").as("ew")),
        Seq(degF), Seq(degR))
      val newAll = base.unionByName(delta)
      val newIdx = EdgeIndex(
        newAll.select(col("src").as("k"), col("dst").as("v"), col("w").as("ew")),
        newAll.select(col("dst").as("k"), col("src").as("v"), col("w").as("ew")),
        Seq(degF, EdgeIndex.degrees(delta, true)), Seq(degR, EdgeIndex.degrees(delta, false)))
      val raw = GenericJoin.deltaStep(delta, oldIdx, newIdx, Planner.triangle,
        pruneZero = true, routing = routing)
      t("deltaStep RAW count") { raw.agg(count(lit(1))).collect() }
      t("deltaStep consolidated") {
        GenericJoin.consolidateMatches(raw).agg(count(lit(1))).collect()
      }
      val oneRel = GenericJoin.runPlan(
        delta.select(array(col("src"), col("dst")).as("p"), col("w")),
        Planner.planRelation(0, Planner.triangle), _ => oldIdx, routing = routing)
      t("single relation count") { oneRel.agg(count(lit(1))).collect() }
      delta.unpersist()
    }
    spark.stop()
  }
}
