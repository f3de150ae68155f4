package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plan.Planner

/** Composite-key seeded queries — the reference's triangle-seeded mode
  * (/root/reference/examples/seed.rs:37-79): instead of extending node
  * prefixes one attribute at a time over the EDGE relation, extend over the
  * materialized TRIANGLE relation, keyed by node pairs (the reference
  * indexes T by hash (a+b), examples/seed.rs:63-64).
  *
  * K4(w,x,y,z) := T(w,x,y), T(w,x,z), T(w,y,z) — three triangle "faces"
  * cover all six K4 edges, so for 0/1-weighted edge sets the output binding
  * set equals the edge-at-a-time `clique4` enumeration (pinned by test).
  * Propose = equi-join on composite key (w,x); intersect = semijoin on
  * composite key (w,y) plus the bound z. */
object SeedQueries {

  /** Materialized directed-triangle relation (x0,x1,x2). */
  def triangles(edges: DataFrame): DataFrame =
    GenericJoin.enumerate(edges, Planner.triangle).select("x0", "x1", "x2")

  /** Triangle-seeded FACTORIZED 4-clique count — the reference's
    * seed-q5-lean mode one clique size down
    * (/root/reference/examples/seed-q5-lean.rs:86-104): per triangle
    * (a,b,c) the K4 completions are |adj(a) ∩ adj(b) ∩ adj(c)|, counted
    * from sorted adjacency arrays without ever materializing a K4 row —
    * the scale-safe form of [[seededK4]]'s full output (117M rows at
    * sf0.1). `tri` is the materialized triangle relation (x0,x1,x2);
    * callers supply it so the fast engine can produce it. The adjacency
    * side joins un-hinted: AQE broadcasts it when |V| is small and falls
    * back to a shuffle join at scale. Requires a 0/1 edge Z-set. */
  def seededK4Count(edges: DataFrame, tri: DataFrame): DataFrame = {
    // materialized once: the 0/1 guard scan and the adjacency-array build
    // both read this frame (without it the consolidation shuffle runs twice)
    val consolidated = GenericJoin.require01(
      EdgeIndex.consolidate(edges).localCheckpoint(), "seededK4Count")
    val adj = consolidated.groupBy(col("src").as("k"))
      .agg(sort_array(collect_list("dst")).as("vs"))
    var cur = tri.select("x0", "x1", "x2")
    for ((x, i) <- Seq("x0", "x1", "x2").zipWithIndex) {
      cur = cur.join(adj.select(col("k").as(s"_k$i"), col("vs").as(s"_vs$i")),
        col(x) === col(s"_k$i")).drop(s"_k$i")
    }
    cur.select(size(array_intersect(array_intersect(col("_vs0"), col("_vs1")),
        col("_vs2"))).cast("long").as("cnt"))
      .agg(coalesce(sum("cnt"), lit(0L)).as("total"))
  }

  /** Triangle-seeded 4-cliques (x0,x1,x2,x3,w=1) over a 0/1 edge set.
    * The triangle relation feeds seed/propose/intersect — three subplans —
    * so it is persisted once here; without this the full WCO triangle
    * enumeration executes three times per query (measured ~3× the time). */
  def seededK4(edges: DataFrame): DataFrame = {
    val tri = triangles(edges).persist()
    val seed = tri.select(col("x0").as("k0"), col("x1").as("k1"), col("x2").as("y"))
    val prop = tri.select(col("x0").as("k0"), col("x1").as("k1"), col("x2").as("z"))
    val isect = tri.select(col("x0").as("k0"), col("x1").as("y"), col("x2").as("z"))
    seed.join(prop, Seq("k0", "k1")) // propose z via composite key (w,x)
      .join(isect, Seq("k0", "y", "z"), "left_semi") // intersect via (w,y)
      .select(col("k0").as("x0"), col("k1").as("x1"), col("y").as("x2"),
        col("z").as("x3"), lit(1L).as("w"))
  }
}
