package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints the formatted physical plan of named SparkEntry catalog queries —
  * the plan-audit loop: check for single-partition exchanges, nested-loop
  * joins, missing pushdown, and broken whole-stage codegen before a query
  * is declared scale-ready.
  *
  * AQE is DISABLED here on purpose: an unexecuted AdaptiveSparkPlan prints
  * only its initial plan, so auditing the string with AQE on would miss
  * AQE-introduced shapes entirely (and AQE coalescing a tiny local shuffle
  * to one partition is a small-data artifact, not the scale property under
  * audit). The static plan is the audit object.
  *
  * args: <sfDir> <name[,name...]> [mode]   (mode: formatted|extended|cost) */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val mode = ExplainMode.fromString(if (args.length > 2) args(2) else "formatted")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(mode))
      // one-line audit of the usual scale red flags
      val plan = df.queryExecution.executedPlan.toString
      val flags = Seq(
        "Exchange SinglePartition" -> plan.contains("Exchange SinglePartition"),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
        .collect { case (f, true) => f }
      println(s"[audit] $n red-flags: " +
        (if (flags.isEmpty) "none" else flags.mkString(", ")))
    }
    spark.stop()
  }
}
