package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS (hop distance) over a directed edge set — the
  * reachability primitive a pipeline uses for "everything within k hops of
  * these seed pages/documents" (crawl frontier expansion, contamination
  * neighborhoods around eval documents, graph-locality features).
  *
  * Each round relaxes dist(v) = min(dist(v), min_{u→v} dist(u) + 1): one
  * equi-join of the current distance table against edges on src plus one
  * groupBy-min — two keyed shuffles per hop, map-side combined, no driver
  * state. Distances are exact integers so the result is independent of
  * partitioning and arrival order, and a recursive-CTE oracle (UNION, so
  * (node, dist) pairs dedup instead of enumerating paths) replays it
  * exactly. `localCheckpoint` per round keeps the plan O(1) in hops, as in
  * [[ConnectedComponents]] / [[PageRank]].
  *
  * A frontier-only optimization (join just the rows whose distance changed
  * last round) saves shuffle volume on high-diameter graphs; on the dense
  * derived transcript graphs the frontier IS nearly the whole reached set
  * after 2 hops, so the simple full-relax form is kept — the join input is
  * bounded by the reached set either way.
  */
object Bfs {

  /** (node, dist) for every node reachable from `seeds` within `maxHops`
    * directed hops (seeds at distance 0). `seeds` = one-column DataFrame of
    * node ids. */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .repartition(col("src")).persist()
    var dist = seeds.select(col(seeds.columns.head).cast("long").as("n"))
      .distinct().withColumn("d", lit(0L)).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = e.join(dist.withColumnRenamed("n", "src"), "src")
        .select(col("dst").as("n"), (col("d") + 1L).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("n").agg(min("d").as("d"))
        .localCheckpoint()
    }
    e.unpersist()
    dist.select(col("n").as("node"), col("d").as("dist"))
  }

  /** Recursive-CTE oracle appended after `edges` and `seeds` CTEs: UNION
    * (not UNION ALL) makes the recursion explore (node, dist) PAIRS — at
    * most maxHops+1 rows per node — instead of enumerating paths. */
  def oracleCtes(maxHops: Int): String =
    ", walk(n, d) AS (SELECT s, CAST(0 AS BIGINT) FROM seeds " +
      "UNION SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.n " +
      s"WHERE w.d < $maxHops) " +
      "SELECT n AS node, min(d) AS dist FROM walk GROUP BY n"
}
