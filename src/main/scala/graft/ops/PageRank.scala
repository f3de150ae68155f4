package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in scaled INTEGER arithmetic — the iterative
  * Pregel-style companion to [[ConnectedComponents]]: rank flows along the
  * same derived transcript graph the motif queries run on, and a
  * training-data pipeline uses it to weight documents/pages by link
  * centrality before sampling.
  *
  * Why integers: double-precision PageRank sums per-neighbor products in
  * shuffle arrival order, so two engines (or two runs at different
  * parallelism) disagree in the last ulp and a hash-comparing oracle gate
  * breaks. Scaled longs make every step exact and order-independent:
  *
  *   r_0(v)   = SCALE                          (SCALE = 10^6)
  *   r_{i+1}(v) = (3·SCALE)/20  +  (17 · Σ_{u→v} (r_i(u) div outdeg(u))) div 20
  *
  * i.e. d = 0.85 = 17/20 as an exact rational, per-edge contributions
  * floored once at the source (`div` = integer floor division), and the
  * damped sum floored once at the sink. Dangling-node mass is NOT
  * redistributed (the "leaky" variant — documented, deterministic; the
  * redistribution term would add one scalar aggregate per iteration).
  * Overflow headroom: total mass ≤ |V|·SCALE, ×17 fits a long for any
  * |V| < 5·10^11.
  *
  * Scale shape: one keyed shuffle pair per iteration — join ranks to the
  * (edge ⋈ outdeg) table on src (that table is computed once, persisted,
  * and pre-partitioned by src so only the small rank table moves), then
  * groupBy(dst) with map-side partial sums. Per-iteration
  * `localCheckpoint` keeps the lineage/plan O(1) in the iteration count,
  * same as [[ConnectedComponents.run]]. The reference has no iterative
  * fixpoint operator; this rides the same index-shard partitioning
  * discipline its count/propose steps use (/root/reference/src/index.rs).
  */
object PageRank {

  val Scale = 1000000L

  /** (node, rank) after `iters` iterations over the directed edge set.
    * Ranks are scaled longs (initial mass SCALE per node). Implemented as
    * the all-seeds case of [[personalized]] — ONE copy of the recurrence
    * (GraphAlgosSpec pins the equivalence independently). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val all = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct()
    personalized(edges, srcCol, dstCol, seeds = all, iters = iters)
  }

  /** PERSONALIZED PageRank: teleport mass flows only to `seeds` (the
    * relevance-to-a-query-set ranking recommendation pipelines use),
    * same exact integer recurrence as [[run]] with the teleport term
    * gated per node:
    *
    *   r_0(v) = isSeed(v)·SCALE
    *   r_{i+1}(v) = isSeed(v)·(3·SCALE)/20 + (17 · Σ inflow) div 20
    *
    * Identical scale shape (one keyed shuffle pair per iteration, seeds
    * ride the checkpointed node table); [[run]] is the special case
    * "every node is a seed". */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
    val seedSet = seeds.select(col(seeds.columns.head).cast("long").as("n"))
      .distinct().withColumn("s1", lit(1L))
    val nodes = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct()
      .join(seedSet, Seq("n"), "left")
      .select(col("n"), coalesce(col("s1"), lit(0L)).as("isSeed"))
      .localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val eo = e.join(outdeg, "src").repartition(col("src")).persist()

    var r = nodes.select(col("n"), (col("isSeed") * Scale).as("r"))
    for (_ <- 1 to iters) {
      val inflow = eo.join(r.withColumnRenamed("n", "src"), "src")
        .select(col("dst").as("n"), expr("r div d").as("c"))
        .groupBy("n").agg(sum("c").as("s"))
      r = nodes.join(inflow, Seq("n"), "left")
        .select(col("n"), (col("isSeed") * lit(3L * Scale / 20) +
          expr(s"17 * coalesce(s, 0L) div 20")).as("r"))
        .localCheckpoint()
    }
    eo.unpersist()
    r.select(col("n").as("node"), col("r").as("rank_scaled"))
  }

  /** ONE unroll template for both oracle forms — only the `nodes` CTE's
    * is_seed definition differs, so the two gated entries cannot drift. */
  private def oracleUnroll(iters: Int, nodesCte: String): String = {
    val head = nodesCte +
      ", outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1)" +
      s", r0 AS (SELECT n, CAST(is_seed * $Scale AS BIGINT) AS r FROM nodes)"
    val steps = (1 to iters).map { i =>
      s", r$i AS (SELECT nodes.n, nodes.is_seed * ${3L * Scale / 20} + (17 * COALESCE(s.c, 0)) // 20 AS r " +
        s"FROM nodes LEFT JOIN (SELECT e.dst AS n, SUM(r.r // o.d) AS c " +
        s"FROM edges e JOIN r${i - 1} r ON r.n = e.src " +
        "JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s ON s.n = nodes.n)"
    }.mkString
    head + steps + s" SELECT n AS node, CAST(r AS BIGINT) AS rank_scaled FROM r$iters"
  }

  /** Personalized replay as unrolled CTEs, appended after existing `edges`
    * AND `seeds(s)` CTEs. */
  def personalizedOracleCtes(iters: Int = 5): String =
    oracleUnroll(iters,
      ", nodes AS (SELECT n, CASE WHEN n IN (SELECT s FROM seeds) THEN 1 ELSE 0 END AS is_seed " +
        "FROM (SELECT src AS n FROM edges UNION SELECT dst FROM edges))")

  /** The same computation as `iters` unrolled DuckDB CTE stages, appended
    * after an existing `edges` CTE — the oracle replays every floor
    * division bit-for-bit (the all-seeds instantiation of the template). */
  def oracleCtes(iters: Int = 5): String =
    oracleUnroll(iters,
      ", nodes AS (SELECT n, 1 AS is_seed " +
        "FROM (SELECT src AS n FROM edges UNION SELECT dst FROM edges))")
}
