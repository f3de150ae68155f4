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

  /** The undirected distinct view (self-loops dropped) both entry points
    * and [[modularityOf]] share — built ONCE per invocation, never twice. */
  private def undirectedView(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame = {
    val d = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    d.unionByName(d.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct()
  }

  /** (node, label) after `rounds` synchronous updates. Input edges are
    * directed rows; propagation runs on the undirected distinct view
    * (self-loops dropped). Nodes with no surviving edge do not appear. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          rounds: Int): DataFrame = {
    val und = undirectedView(edges, srcCol, dstCol)
      .repartition(col("v")).persist()
    val out = runOnUnd(und, rounds)
    und.unpersist()
    out
  }

  /** LPA over a prebuilt (and caller-persisted) undirected view. */
  private def runOnUnd(und: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    var labels = und.select(col("u").as("n")).distinct()
      .withColumn("lbl", col("n")).localCheckpoint()
    for (_ <- 1 to rounds)
      labels = propagateRound(und, labels).localCheckpoint()
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

  /** Per-community MODULARITY audit of the LPA labeling — the quality
    * check a pipeline runs before trusting a community structure: for each
    * label c, (n_nodes, intra_edges e_c, degree_sum d_c) plus the exact
    * integer numerator of its modularity contribution. Newman's
    * Q = Σ_c (e_c/m − (d_c/2m)²) scaled by (2m)² gives
    * q_num_c = 2m·2e_c − d_c², all integers — Q = Σ q_num / (2m)², no
    * float ever computed, so the hash gate is exact. (d_c² needs
    * d_c < 3·10⁹ to stay in a long — a per-COMMUNITY degree sum; a
    * community that hot would have failed the labeling's purpose first.)
    * One labeling pass + two keyed aggregates; nothing driver-side but
    * the scalar 2m. */
  def modularityOf(edges: DataFrame, srcCol: String, dstCol: String,
                   rounds: Int): DataFrame = {
    val und = undirectedView(edges, srcCol, dstCol)
      .repartition(col("v")).persist()
    val m2 = und.count() // = 2m (both directions counted)
    val labels = runOnUnd(und, rounds)
      .select(col("node").as("n"), col("label"))
    val byNode = und
      .join(labels.withColumnRenamed("n", "u")
        .withColumnRenamed("label", "lu"), "u")
      .join(labels.withColumnRenamed("n", "v")
        .withColumnRenamed("label", "lv"), "v")
    // per label: degree mass d_c (every incident half-edge) and 2·e_c
    // (intra rows — und carries both directions, so intra pairs count 2×)
    val agg = byNode.groupBy(col("lu").as("label"))
      .agg(count(lit(1)).as("degree_sum"),
        sum(when(col("lu") === col("lv"), 1L).otherwise(0L)).as("e2"))
    val nByLabel = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val out = nByLabel.join(agg, Seq("label"))
      .select(col("label"), col("n_nodes"),
        (col("e2") / 2).cast("long").as("intra_edges"),
        col("degree_sum"),
        (lit(m2) * col("e2")
          - col("degree_sum") * col("degree_sum")).as("q_num"))
      .localCheckpoint()
    und.unpersist()
    out
  }

  /** Oracle body for [[modularityOf]] (appends to the shared l-chain). */
  def modularityOracleCtes(rounds: Int): String =
    lpaCtesBody(rounds) +
      s", lab AS (SELECT n, lbl FROM l$rounds)" +
      ", m2 AS (SELECT count(*) AS c FROM und)" +
      ", bn AS (SELECT und.u, und.v, x.lbl AS lu, y.lbl AS lv FROM und " +
      "JOIN lab x ON x.n = und.u JOIN lab y ON y.n = und.v)" +
      ", ag AS (SELECT lu AS label, count(*) AS degree_sum, " +
      "CAST(sum(CASE WHEN lu = lv THEN 1 ELSE 0 END) AS BIGINT) AS e2 FROM bn GROUP BY lu)" +
      ", nn AS (SELECT lbl AS label, count(*) AS n_nodes FROM lab GROUP BY lbl) " +
      "SELECT CAST(nn.label AS BIGINT) AS label, nn.n_nodes, " +
      "CAST(e2 // 2 AS BIGINT) AS intra_edges, ag.degree_sum, " +
      "CAST(m2.c * e2 - ag.degree_sum * ag.degree_sum AS BIGINT) AS q_num " +
      "FROM nn JOIN ag ON nn.label = ag.label, m2"

  /** The shared unrolled l-chain (und + l0..l`rounds`); both oracles
    * compose from this ONE body so neither can drift. */
  private def lpaCtesBody(rounds: Int): String = {
    val head =
      ", und AS (SELECT src AS u, dst AS v FROM edges WHERE src <> dst " +
        "UNION SELECT dst, src FROM edges WHERE src <> dst)" +
        ", l0 AS (SELECT DISTINCT u AS n, u AS lbl FROM und)"
    head + (1 to rounds).map { i =>
      s", c$i AS (SELECT und.u, p.lbl, count(*) AS cnt FROM und " +
        s"JOIN l${i - 1} p ON p.n = und.v GROUP BY und.u, p.lbl)" +
        s", l$i AS (SELECT u AS n, lbl FROM (SELECT u, lbl, row_number() " +
        s"OVER (PARTITION BY u ORDER BY cnt DESC, lbl ASC) AS r FROM c$i) " +
        "WHERE r = 1)"
    }.mkString
  }

  /** Unrolled-CTE oracle body (expects an `edges(src, dst)` relation in
    * scope, like [[KCore.oracleCtes]]). */
  def oracleCtes(rounds: Int): String =
    lpaCtesBody(rounds) +
      s" SELECT n AS node, CAST(lbl AS BIGINT) AS label FROM l$rounds"
}
