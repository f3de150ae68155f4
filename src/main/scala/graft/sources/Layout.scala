package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Degree-ordered relabel ETL — the reference's layout step
  * (/root/reference/static_graph/examples/layout.rs:20-106): assign dense
  * new ids in descending total-degree order (ties by old id) and rewrite
  * the edge list. Hub nodes get small ids, which improves intersection
  * locality / galloping behavior in the static-index engines.
  *
  * The dictionary is one aggregation + one global row_number (a single
  * total-order window — acceptable because the dictionary is one row per
  * DISTINCT node, orders of magnitude smaller than the edge list; for
  * >10^9-node graphs swap the window for zipWithIndex over a range-
  * partitioned sort). The relabel itself is two broadcast-or-shuffle
  * equi-joins that scale per-partition. */
object Layout {

  /** (node, new_id) dictionary: new_id = 0,1,2,... by descending degree. */
  def degreeDict(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.withColumn("new_id",
      row_number().over(Window.orderBy(col("deg").desc, col("node").asc))
        .cast("long") - 1L)
  }

  /** Edge list rewritten to degree-ordered dense ids (keeps any extra
    * columns, e.g. w / ts). */
  def relabel(edges: DataFrame): DataFrame = {
    val dict = degreeDict(edges).select("node", "new_id")
    val extra = edges.columns.filterNot(c => c == "src" || c == "dst").map(col)
    edges
      .join(dict.withColumnRenamed("new_id", "_nsrc"), col("src") === col("node"))
      .drop("node")
      .join(dict.withColumnRenamed("new_id", "_ndst"), col("dst") === col("node"))
      .drop("node")
      .select((Seq(col("_nsrc").as("src"), col("_ndst").as("dst")) ++ extra): _*)
  }
}
