package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-round SYNCHRONOUS label propagation (community detection) over an
  * undirected simple graph — the cheap community pass a pipeline runs to
  * group near-duplicate clusters, topic-partition a link graph, or seed
  * partitioning before heavier algorithms (Raghavan et al. 2007's LPA, in
  * its deterministic synchronous form).
  *
  * Every node starts as its own label; each round, every node adopts the
  * most frequent label among its NEIGHBORS, ties broken by the smallest
  * label — fully deterministic, so the result is partitioning/rerun
  * invariant and the oracle replays the rounds as unrolled CTEs (same
  * fixed round count on both engines; synchronous LPA can oscillate on
  * bipartite structures, which a fixed round count makes irrelevant to
  * the gate — convergence on known graphs is pinned by LabelPropSpec).
  *
  * Per round: one keyed equi-join of the edge set against the |V|-row
  * label table, a (node, label) count, and a node-partitioned argmax
  * window — three keyed shuffles, map-side combined, no driver state,
  * the same per-round shape as [[KCore]]/[[PageRank]].
  * `localCheckpoint` per round keeps the plan O(1) in rounds. */
object LabelProp {

  /** (node, label) after `rounds` synchronous updates. Input edges are
    * directed rows; propagation runs on the undirected distinct view
    * (self-loops dropped). Nodes with no surviving edge do not appear. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val d = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val und = d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct()
      .repartition(col("v")).persist()
    var labels = und.select(col("u").as("n")).distinct()
      .withColumn("lbl", col("n")).localCheckpoint()
    for (_ <- 1 to rounds)
      labels = propagateRound(und, labels).localCheckpoint()
    und.unpersist()
    labels.select(col("n").as("node"), col("lbl").as("label"))
  }

  /** One synchronous round: argmax neighbor label per node, (count DESC,
    * label ASC) tie-break. Exposed for the spec's plan/equality pins. */
  private[graft] def propagateRound(und: DataFrame,
                                    labels: DataFrame): DataFrame = {
    val w = Window.partitionBy("u")
      .orderBy(col("cnt").desc, col("lbl").asc)
    und
      .join(labels.withColumnRenamed("n", "v"), "v")
      .groupBy("u", "lbl").agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(w))
      .where(col("r") === 1)
      .select(col("u").as("n"), col("lbl"))
  }

  /** Unrolled-CTE oracle body (expects an `edges(src, dst)` relation in
    * scope, like [[KCore.oracleCtes]]). */
  def oracleCtes(rounds: Int): String = {
    val head =
      ", und AS (SELECT src AS u, dst AS v FROM edges WHERE src <> dst " +
        "UNION SELECT dst, src FROM edges WHERE src <> dst)" +
        ", l0 AS (SELECT DISTINCT u AS n, u AS lbl FROM und)"
    val steps = (1 to rounds).map { i =>
      s", c$i AS (SELECT und.u, p.lbl, count(*) AS cnt FROM und " +
        s"JOIN l${i - 1} p ON p.n = und.v GROUP BY und.u, p.lbl)" +
        s", l$i AS (SELECT u AS n, lbl FROM (SELECT u, lbl, row_number() " +
        s"OVER (PARTITION BY u ORDER BY cnt DESC, lbl ASC) AS r FROM c$i) " +
        "WHERE r = 1)"
    }.mkString
    head + steps +
      s" SELECT n AS node, CAST(lbl AS BIGINT) AS label FROM l$rounds"
  }
}
