package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.batch.{EdgeIndex, GenericJoin}
import graft.gen.TranscriptGen
import graft.plan.Planner
import graft.transcripts.TranscriptEdges

/** One-off sizing probe for bench parameter selection. */
object SizeCheck {
  def main(args: Array[String]): Unit = {
    val nConvs = args(0).toInt; val turns = args(1).toInt; val nTools = args(2).toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val ts = TranscriptGen.generate(spark, TranscriptGen.Config(nConvs, turns, nTools)).toDF().cache()
    println(s"[size] turns=${ts.count()} genSec=${(System.nanoTime()-t0)/1e9}")
    val edges = TranscriptEdges.toolToolEdges(ts).select("src", "dst", "w")
    val cons = EdgeIndex.consolidate(edges).cache()
    println(s"[size] rawEdges=${edges.count()} distinctEdges=${cons.count()}")
    println(s"[size] maxW=${cons.agg(max("w")).collect()(0).getLong(0)}")
    val deg = cons.groupBy("src").agg(count(lit(1)).as("d"))
    println(s"[size] maxOutDeg=${deg.agg(max("d")).collect()(0).getLong(0)} nodes=${deg.count()}")
    val t1 = System.nanoTime()
    val tri = GenericJoin.enumerate(cons, Planner.triangle)
    val nTri = tri.count()
    println(s"[size] distinctTriangles=$nTri triSec=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}
