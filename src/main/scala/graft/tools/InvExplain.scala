package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
/** Prints the inverted-index build subtree plan (the part hidden behind
  * jaccardPairsAuto's eager checkpoint in ExplainQuery output) — the
  * audit object for the round-6 InferFiltersFromGenerate fix. */
object InvExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs2 = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" xyzzy")).as("text")))
    // the inverted-index build exactly as Dedup.invIndex writes it (round 6:
    // spread + token projection boundary + explode_outer/null-filter)
    val inv = docs2.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id").as("id"), graft.text.TextOps.tokens(col("text")).as("_t"))
      .select(col("id"), graft.dedup.Dedup.shinglesOfTokens(col("_t"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
      .select(col("id"), col("nsh"), explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull)
    println("===== inv_build =====")
    println(inv.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
