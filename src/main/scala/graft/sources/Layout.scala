package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Degree-ordered relabel ETL — the reference's layout step
  * (/root/reference/static_graph/examples/layout.rs:20-106): assign dense
  * new ids in descending total-degree order (ties by old id) and rewrite
  * the edge list. Hub nodes get small ids, which improves intersection
  * locality / galloping behavior in the static-index engines.
  *
  * The dictionary is one aggregation + a global dense rank. How the rank is
  * computed is a SIZE-GATED plan decision ([[denseRankByOrder]]): one
  * row_number window while the dictionary is small, a range-partitioned
  * sort + zipWithIndex past the threshold — identical output, no
  * single-task global sort at 10^9 nodes. The relabel itself is two
  * broadcast-or-shuffle equi-joins that scale per-partition. */
object Layout {

  /** Dictionary row count above which the global rank abandons the single
    * row_number window. ~10^7 rows is well within one task's sort budget;
    * past it the window's single-partition exchange becomes the scan
    * bottleneck the rest of the plan avoided. */
  val defaultWindowMaxRows: Long = 10L * 1000 * 1000

  /** Appends `rankCol` = base, base+1, ... in the given TOTAL order (ties
    * must be broken by the order itself). Small inputs: one row_number
    * window. Large inputs: range-partition + per-partition sort (a global
    * sort across ordered partitions) + zipWithIndex — the global index of a
    * totally sorted RDD is independent of partition boundaries, so the two
    * paths emit IDENTICAL rows (SourcesSpec pins it). The input is
    * localCheckpoint'ed: the sizing count and both rank paths reuse one
    * materialization, and the dictionary feeds multiple downstream joins. */
  def denseRankByOrder(keyed: DataFrame, order: Seq[Column], rankCol: String,
                       base: Long,
                       windowMaxRows: Long = defaultWindowMaxRows): DataFrame = {
    val d = keyed.localCheckpoint()
    if (d.count() <= windowMaxRows)
      d.withColumn(rankCol,
        row_number().over(Window.orderBy(order: _*)).cast("long") + lit(base - 1))
    else {
      val spark = d.sparkSession
      val parts = spark.sessionState.conf.numShufflePartitions
      val sorted = d.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
      val schema = sorted.schema.add(rankCol, LongType)
      val rows = sorted.rdd.zipWithIndex()
        .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + base)) }
      spark.createDataFrame(rows, schema)
    }
  }

  /** (node, new_id) dictionary: new_id = 0,1,2,... by descending degree. */
  def degreeDict(edges: DataFrame,
                 windowMaxRows: Long = defaultWindowMaxRows): DataFrame = {
    val deg = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    denseRankByOrder(deg, Seq(col("deg").desc, col("node").asc), "new_id",
      base = 0L, windowMaxRows = windowMaxRows)
  }

  /** Z-order (Morton) interleave of two non-negative integer columns as
    * one SQL expression string — valid in BOTH Spark SQL and DuckDB, so
    * the oracle replays it verbatim. Writing a table sorted by this key
    * clusters rows that are close in (a, b) space into the same files:
    * parquet min/max stats then prune 2-D range predicates (src-range ×
    * dst-range, lat × lon, ts × user bucket) where a single-column sort
    * prunes only one dimension. The layout-ETL companion to [[relabel]];
    * bit-disjoint terms, so `+` is exact and overflow-free for
    * bits ≤ 31. */
  def zOrderSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
  }

  /** Edge list rewritten to degree-ordered dense ids (keeps any extra
    * columns, e.g. w / ts). */
  def relabel(edges: DataFrame,
              windowMaxRows: Long = defaultWindowMaxRows): DataFrame = {
    val dict = degreeDict(edges, windowMaxRows).select("node", "new_id")
    val extra = edges.columns.filterNot(c => c == "src" || c == "dst").map(col)
    edges
      .join(dict.withColumnRenamed("new_id", "_nsrc"), col("src") === col("node"))
      .drop("node")
      .join(dict.withColumnRenamed("new_id", "_ndst"), col("dst") === col("node"))
      .drop("node")
      .select((Seq(col("_nsrc").as("src"), col("_ndst").as("dst")) ++ extra): _*)
  }
}
