package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling over an undirected simple graph — the
  * degeneracy filter a pipeline runs to keep only densely-connected
  * regions (spam/link-farm pruning, community seeds for the motif
  * queries: a K4 can only live inside the 3-core, so peeling first
  * shrinks the WCO engine's input for clique work).
  *
  * Each round drops every node whose degree in the CURRENT induced
  * subgraph is < k: two equi-joins of the edge set against the alive
  * set plus one groupBy-count — three keyed shuffles per round, map-side
  * combined, no driver state. Degrees are exact integers so the result
  * is independent of partitioning, and the oracle replays the rounds as
  * unrolled CTEs (same fixed round count on both engines — at a fixed
  * `rounds` the outputs match by construction whether or not the peel
  * has converged; convergence itself is pinned by KCoreSpec on a graph
  * whose cascade is known). `localCheckpoint` per round keeps the plan
  * O(1) in rounds, as in [[ConnectedComponents]] / [[PageRank]] /
  * [[Bfs]].
  *
  * The alive set only shrinks, so per-round cost is bounded by the
  * previous round's survivors — the expensive first rounds are plain
  * keyed shuffles over the full edge set that Spark schedules like any
  * aggregation at 100 TB.
  */
object KCore {

  /** (node, deg) for every node still alive after `rounds` peel rounds at
    * threshold `k`, with `deg` its degree in the final induced subgraph.
    * Input edges are directed rows; the peel runs on the undirected
    * distinct view. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    require(rounds >= 1, "rounds must be positive")
    val d = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val und = d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct()
      .repartition(col("u")).persist()
    var alive = und.select(col("u").as("n")).distinct().localCheckpoint()
    for (_ <- 1 to rounds)
      alive = peelRound(und, alive, k).localCheckpoint()
    // materialize (localCheckpoint is eager) BEFORE unpersisting the edge
    // set — a lazy result would recompute `und` from source on evaluation
    val core = und
      .join(alive.withColumnRenamed("n", "u"), "u")
      .join(alive.withColumnRenamed("n", "v"), "v")
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
      .localCheckpoint()
    und.unpersist()
    core
  }

  /** One peel round: survivors of `alive` whose degree in the induced
    * subgraph is ≥ k (exposed for the plan audit — the round's joins must
    * stay keyed; the driver entry's returned plan is checkpoint-truncated
    * and would audit vacuously). */
  private[graft] def peelRound(und: DataFrame, alive: DataFrame,
                               k: Int): DataFrame =
    und
      .join(alive.withColumnRenamed("n", "u"), "u")
      .join(alive.withColumnRenamed("n", "v"), "v")
      .groupBy("u").agg(count(lit(1)).as("d"))
      .where(col("d") >= k)
      .select(col("u").as("n"))

  /** The same peel as `rounds` unrolled DuckDB CTE stages, appended after
    * an existing `edges(src, dst)` CTE. */
  def oracleCtes(k: Int, rounds: Int): String = {
    val head =
      ", und AS (SELECT src AS u, dst AS v FROM edges WHERE src <> dst " +
        "UNION SELECT dst, src FROM edges WHERE src <> dst)" +
        ", a0 AS (SELECT DISTINCT u AS n FROM und)"
    val steps = (1 to rounds).map { i =>
      s", a$i AS (SELECT u AS n FROM und " +
        s"JOIN a${i - 1} x ON x.n = und.u JOIN a${i - 1} y ON y.n = und.v " +
        s"GROUP BY u HAVING count(*) >= $k)"
    }.mkString
    head + steps +
      s" SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM und " +
      s"JOIN a$rounds x ON x.n = und.u JOIN a$rounds y ON y.n = und.v GROUP BY u"
  }
}
