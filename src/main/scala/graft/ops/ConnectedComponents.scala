package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering step a near-dup pipeline runs AFTER candidate-pair generation
  * (MinHash/SimHash pairs → components → one keeper per component).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed as
  * DataFrame aggregations:
  *
  *   large-star: for every node u, connect each strictly-larger neighbor
  *               v > u to m = min(Γ(u) ∪ {u});
  *   small-star: orient edges (hi → lo); for every hi, connect hi and each
  *               lo-neighbor to m = min over those.
  *
  * Both steps are one groupBy + one co-keyed join (two shuffles/round), and
  * the pair converges in O(log² n) rounds — at 100 TB each round is a plain
  * keyed shuffle Spark schedules like any aggregation; there is no driver
  * state and no global window anywhere. Each round `localCheckpoint`s the
  * edge set so lineage (and the plan Catalyst must analyze) stays O(1) in
  * the round count rather than growing by two joins per iteration.
  *
  * Convergence test: a round that changes nothing leaves the (distinct)
  * edge set fixed, detected by (count, sum-of-pair-hash) equality — two
  * scalar aggregates over a DataFrame that is persisted for the next round
  * anyway. On convergence every edge is (node → its component's minimum),
  * which is exactly the output labeling.
  *
  * Skew note: the final star concentrates a giant component's members on
  * its root's reducer key. The groupBy sides are safe (partial aggregation
  * combines map-side); the join side is an equi-join AQE's skew-join split
  * handles. That matches how the reference engine keeps hot keys workable —
  * hash-partitioned state with work split by key ranges
  * (/root/reference/src/index.rs:343-384).
  */
object ConnectedComponents {

  /** Label every node reachable from `edges` (and every node in `vertices`,
    * if given — singletons label themselves) with the minimum node id in
    * its component. Output columns: (node, component). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          vertices: Option[DataFrame] = None, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // distinct undirected edge set as (u, v) with u != v
    var e = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint()

    var converged = false
    var it = 0
    var sig = signature(e)
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      // signature match is a candidate fixed point; confirm EXACTLY with a
      // one-sided difference (counts already equal + both sets distinct ⇒
      // empty difference = set equality). The except runs once, at
      // convergence — a hash collision can cost one extra check, never a
      // wrong label.
      converged = nextSig == sig && next.exceptAll(e).isEmpty
      sig = nextSig
      e = next
      it += 1
    }

    // post-convergence every edge is (member → root); add roots + singletons
    val labeled = e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(e.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min("component").as("component"))
    vertices match {
      case None => labeled
      case Some(vs) =>
        val all = vs.select(col(vs.columns.head).cast("long").as("node")).distinct()
        all.join(labeled, Seq("node"), "left")
          .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    }
  }

  /** INCREMENTAL absorb: fold a batch of new edges into an existing
    * (node, component) labeling WITHOUT the edge history. The labeling IS
    * a star forest (node → its component's root), and components of
    * (star forest ∪ new edges) equal components of (all edges ever) — the
    * union-find invariant — so each batch runs [[run]] on |labels| +
    * |batch| edges, never on the accumulated graph. Star edges have depth
    * 1, so convergence is fast regardless of how many batches came before;
    * state stays one table of |V| rows. This is the maintenance loop a
    * streaming near-dup clusterer runs per micro-batch (new MinHash/LSH
    * pairs in, updated keeper labels out), the `foreachBatch` complement
    * of [[graft.streaming.DedupStream]]'s per-key keeper state. */
  def absorb(labels: DataFrame, newEdges: DataFrame,
             srcCol: String, dstCol: String): DataFrame = {
    val star = labels.select(col("node").as("u"), col("component").as("v"))
    val batch = newEdges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val verts = labels.select("node")
      .unionByName(batch.select(col("u").as("node")))
      .unionByName(batch.select(col("v").as("node")))
    run(star.unionByName(batch), "u", "v", vertices = Some(verts))
  }

  /** large-star: every neighbor v > u links to min(Γ(u) ∪ {u}). Emitted as
    * a groupBy computing the per-u minimum joined back against the strictly
    * larger neighbors. */
  private[ops] def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(least(min("v"), first("u")).as("m"))
    nbrs.join(mins, "u").where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v")).distinct()
  }

  /** small-star: orient (hi → lo); hi and all its lo-neighbors link to the
    * minimum of the group. */
  private[ops] def smallStar(e: DataFrame): DataFrame = {
    val hiLo = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = hiLo.groupBy("u").agg(min("v").as("m"))
    val loLinks = hiLo.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
    val hiLinks = mins.select(col("u"), col("m").as("v"))
    loLinks.unionByName(hiLinks)
      .where(col("u") =!= col("v")).distinct()
  }

  /** (count, order-independent hash-sum) fingerprint of the distinct edge
    * set — two scalars per round, used only to SKIP the exact set-equality
    * check on rounds that visibly changed something. */
  private def signature(e: DataFrame): (Long, String) = {
    // hash folded into [0, 2^31) and summed as decimal(38,0): exact and
    // overflow-free (ANSI mode) even at 10^9-edge scale
    val row = e.agg(count(lit(1)),
      sum(pmod(xxhash64(col("u"), col("v")), lit(1L << 31)).cast("decimal(38,0)"))).head()
    (row.getLong(0), if (row.isNullAt(1)) "0" else row.getDecimal(1).toPlainString)
  }
}
