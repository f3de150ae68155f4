package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plan.Planner
import graft.plan.Planner.RelationPlan

/** Weighted edge index: the Spark analog of the reference's forward/reverse
  * `IndexStream` pair (/root/reference/src/motif.rs:49-65) backed by
  * DataFrames instead of per-worker in-memory multimaps.
  *
  * Z-set discipline: `ew` is a signed multiplicity. The adjacency frames MAY
  * be unconsolidated (the same (k,v) appearing in several rows whose weights
  * sum to the net multiplicity) — join is bilinear over Z-sets, so joining
  * against the union of parts and summing weights downstream is equivalent
  * to joining against the consolidated relation. This is what lets the
  * incremental engine keep an LSM-style base + tail without re-consolidating
  * O(|E|) state every micro-batch (the reference's tiered index,
  * /root/reference/src/index.rs:16-25, plays the same role).
  *
  * Degree frames are different: each part must be consolidated per key
  * (one row per k), because the count stage reads them via left joins.
  * Degree here = sum of signed multiplicities of a key's neighbors — the
  * proposal-cost measure the reference's `count` operator maintains
  * (/root/reference/src/index.rs:343-384).
  *
  * Columns: fwd/rev = (k, v, ew); deg parts = (k, deg).
  */
final case class EdgeIndex(
    fwd: DataFrame, rev: DataFrame,
    degFwdParts: Seq[DataFrame], degRevParts: Seq[DataFrame]) {
  def adj(forward: Boolean): DataFrame = if (forward) fwd else rev
  def degParts(forward: Boolean): Seq[DataFrame] = if (forward) degFwdParts else degRevParts
}

object EdgeIndex {
  /** Consolidates a raw weighted edge frame (src,dst[,w]) into a Z-set:
    * sum weights per (src,dst), drop zeros (reference consolidation,
    * /root/reference/src/index.rs:197-219). */
  def consolidate(edges: DataFrame): DataFrame =
    norm(edges).groupBy("src", "dst").agg(sum("w").as("w")).filter(col("w") =!= 0L)

  /** (src,dst[,w]) → (src,dst,w) with long types and default weight +1. */
  def norm(edges: DataFrame): DataFrame = {
    val w = if (edges.columns.contains("w")) col("w").cast("long") else lit(1L)
    edges.select(col("src").cast("long"), col("dst").cast("long"), w.as("w"))
  }

  /** Per-key signed degree of an (src,dst,w) frame, in `forward` direction. */
  def degrees(edges: DataFrame, forward: Boolean): DataFrame = {
    val k = if (forward) "src" else "dst"
    edges.groupBy(col(k).as("k")).agg(sum("w").as("deg"))
  }

  /** Index over a single (possibly unconsolidated) edge frame. */
  def apply(edges: DataFrame): EdgeIndex = ofParts(Seq(norm(edges)))

  /** Index over an LSM-style list of edge parts: adjacency = plain union
    * (bilinearity makes consolidation unnecessary); degrees consolidated
    * per part-group. */
  def ofParts(parts: Seq[DataFrame]): EdgeIndex = {
    val normed = parts.map(norm)
    val all = normed.reduce(_ unionByName _)
    val fwd = all.select(col("src").as("k"), col("dst").as("v"), col("w").as("ew"))
    val rev = all.select(col("dst").as("k"), col("src").as("v"), col("w").as("ew"))
    EdgeIndex(fwd, rev,
      degFwdParts = normed.map(degrees(_, forward = true)),
      degRevParts = normed.map(degrees(_, forward = false)))
  }
}

/** Batch worst-case-optimal GenericJoin over DataFrames.
  *
  * One `extendStage` = the reference's `GenericJoin::extend`
  * (/root/reference/src/lib.rs:64-92): per-extender degree lookup (`count`),
  * argmin routing, candidate generation from the cheapest index (`propose`),
  * then validation against every other index (`intersect`). Here each is a
  * relational op Catalyst can optimize — degree lookup = left join against a
  * pre-aggregated degree table; propose = equi-join on the key; intersect =
  * equi-join on the (key, candidate) pair, with weights multiplying through
  * (Z-set bag semantics: a match's weight is the product of its edge
  * weights, so streaming retractions cancel exactly).
  */
object GenericJoin {

  /** One extender for a stage: key at `prefixPos` (0-based) of the prefix,
    * looked up in `index` in the given direction (the Spark form of
    * `extend_using`, /root/reference/src/extender.rs:41-54). */
  final case class Extender(prefixPos: Int, forward: Boolean, index: EdgeIndex)

  /** Inline symmetry-breaking / distinctness predicate between two motif
    * attributes, applied at the EARLIEST extension stage where both are
    * bound — the reference's per-stage retain filters that keep ordered
    * clique enumeration from materializing all k! permutations
    * (/root/reference/examples/q6-lean.rs:62-65 `v2 != v4 && v3 < v4`;
    * /root/reference/static_graph/examples/diamonds.rs:42 `b < c`).
    * `op` ∈ { "<", "<=", ">", ">=", "!=" }; attributes are ORIGINAL motif
    * attribute ids (the planner maps them to prefix positions). */
  final case class Pred(a: Int, b: Int, op: String) {
    def column(left: Column, right: Column): Column = op match {
      case "<"  => left < right
      case "<=" => left <= right
      case ">"  => left > right
      case ">=" => left >= right
      case "!=" => left =!= right
      case other => throw new IllegalArgumentException(s"unsupported predicate op: $other")
    }
  }

  /** Ordered-enumeration predicate set x0 < x1 < ... < x{n-1}: one canonical
    * representative per clique instead of all n! permutations. */
  def ordered(numAttrs: Int): Seq[Pred] =
    (0 until numAttrs - 1).map(a => Pred(a, a + 1, "<"))

  /** Extends a prefix frame (p: array<long>, w: long) by one attribute with
    * the WCO count→argmin→propose→intersect discipline; returns the same
    * schema with p one element longer.
    *
    * @param pruneZero drop prefixes whose minimum extender degree is ≤ 0.
    *        Sound whenever net multiplicities are non-negative (all our
    *        workloads); under adversarial mixed-sign Z-sets turn it off —
    *        the propose/intersect joins then do the pruning implicitly.
    */
  /** @param broadcastPrefixes hint Spark to broadcast the prefix/candidate
    *        side of the propose/intersect joins — correct for micro-batch
    *        deltas (that side is always delta-derived and small); NEVER set
    *        for full batch enumeration. */
  def extendStage(prefixes: DataFrame, extenders: Seq[Extender],
                  pruneZero: Boolean = true, routing: Boolean = true,
                  broadcastPrefixes: Boolean = false): DataFrame = {
    require(extenders.nonEmpty)
    def key(e: Extender): Column = element_at(col("p"), e.prefixPos + 1)
    def hinted(df: DataFrame): DataFrame =
      if (broadcastPrefixes) df.hint("broadcast") else df
    val E = extenders.size

    // No routing / single extender: propose from extender 0, intersect the
    // rest (the reference's single-extender shortcut,
    // /root/reference/src/lib.rs:68-70).
    if (E == 1 || !routing) {
      val prop = extenders.head
      val adj = prop.index.adj(prop.forward)
        .select(col("k").as("_pk"), col("v").as("_ext"), col("ew").as("_ew"))
      var cur = hinted(prefixes).join(adj, key(prop) === col("_pk"))
        .withColumn("w", col("w") * col("_ew"))
        .drop("_pk", "_ew")
      for ((e, j) <- extenders.zipWithIndex.drop(1)) {
        val a = e.index.adj(e.forward)
          .select(col("k").as(s"_ik$j"), col("v").as(s"_iv$j"), col("ew").as(s"_iw$j"))
        // no hint: the candidate side can be orders of magnitude larger
        // than the delta (per-edge match fan-out) — AQE picks from runtime
        // sizes here
        cur = cur.join(a, key(e) === col(s"_ik$j") && col("_ext") === col(s"_iv$j"))
          .withColumn("w", col("w") * col(s"_iw$j"))
          .drop(s"_ik$j", s"_iv$j", s"_iw$j")
      }
      return cur.withColumn("p", concat(col("p"), array(col("_ext")))).drop("_ext")
        .select("p", "w")
    }

    // ---- count: per-extender signed degree (0 when key absent) ----
    var cur = prefixes
    for ((e, i) <- extenders.zipWithIndex) {
      val parts = e.index.degParts(e.forward)
      val pieces = parts.indices.map { pi =>
        val d = parts(pi).select(col("k").as(s"_dk${i}_$pi"), col("deg").as(s"_deg${i}_$pi"))
        // deg tables are per-key aggregates — broadcast-join them (right
        // side of a left-outer join may be broadcast)
        val dd = if (broadcastPrefixes) d.hint("broadcast") else d
        cur = cur.join(dd, key(e) === col(s"_dk${i}_$pi"), "left").drop(s"_dk${i}_$pi")
        coalesce(col(s"_deg${i}_$pi"), lit(0L))
      }
      cur = cur.withColumn(s"_deg$i", pieces.reduce(_ + _))
        .drop(parts.indices.map(pi => s"_deg${i}_$pi"): _*)
    }
    // argmin with ties to the lowest extender id (the reference seeds at
    // 1<<31 and overwrites only on strictly smaller counts,
    // /root/reference/src/index.rs:375-379)
    val structs = extenders.indices.map(i => struct(col(s"_deg$i").as("c"), lit(i).as("i")))
    cur = cur.withColumn("_min", least(structs: _*))
      .drop(extenders.indices.map(i => s"_deg$i"): _*)
    if (pruneZero) cur = cur.filter(col("_min.c") > 0L)
    cur = cur.withColumn("_mi", col("_min.i")).drop("_min")

    // ---- propose + intersect as conditional-key single joins ----
    // Every row routes to its argmin extender without per-branch plan
    // duplication: the adjacency sides of the routed joins are unioned once
    // per DISTINCT (index, direction) and tagged with a group id; the join
    // key and group id on the prefix side are CASE expressions over _mi.
    val groups: Seq[(EdgeIndex, Boolean)] =
      extenders.map(e => (e.index, e.forward)).distinct
    val grpOf: Int => Int = i =>
      groups.indexOf((extenders(i).index, extenders(i).forward))
    def tagged(cols: (String, String, String)): DataFrame =
      groups.zipWithIndex.map { case ((idx, fwd), g) =>
        idx.adj(fwd).select(lit(g).as("_g"), col("k").as(cols._1),
          col("v").as(cols._2), col("ew").as(cols._3))
      }.reduce(_ unionByName _)
    def caseOver(sel: Int => Column)(mi: Column): Column =
      extenders.indices.tail.foldLeft(sel(0)) { (acc, i) =>
        when(mi === i, sel(i)).otherwise(acc)
      }

    // propose: key/group chosen by _mi
    val propAdj = tagged(("_pk", "_ext", "_ew"))
    cur = hinted(cur).join(propAdj,
        col("_g") === caseOver(i => lit(grpOf(i)))(col("_mi")) &&
          col("_pk") === caseOver(i => key(extenders(i)))(col("_mi")))
      .withColumn("w", col("w") * col("_ew"))
      .drop("_g", "_pk", "_ew")

    // intersect: the j-th non-proposer extender, j = 0..E-2; for a row with
    // argmin m, that is extender j when j < m else j+1
    for (j <- 0 until E - 1) {
      val other = when(lit(j) < col("_mi"), lit(j)).otherwise(lit(j + 1))
      val a = tagged((s"_ik$j", s"_iv$j", s"_iw$j"))
      // no hint on the (potentially large) candidate side — see above
      cur = cur.join(a,
          col("_g") === caseOver(i => lit(grpOf(i)))(other) &&
            col(s"_ik$j") === caseOver(i => key(extenders(i)))(other) &&
            col(s"_iv$j") === col("_ext"))
        .withColumn("w", col("w") * col(s"_iw$j"))
        .drop("_g", s"_ik$j", s"_iv$j", s"_iw$j")
    }
    cur.withColumn("p", concat(col("p"), array(col("_ext"))))
      .select("p", "w")
  }

  /** Runs one relation's full pipeline: seed prefixes → extension stages →
    * un-permute back to original attribute order (the reference's
    * `relation_update`, /root/reference/src/motif.rs:135-174).
    * `indexFor(inclusive)` supplies the staleness-correct index version;
    * batch enumeration passes the same index for both.
    * Output columns: x0..x{k-1} (long), w (long). */
  def runPlan(seed: DataFrame, plan: RelationPlan, indexFor: Boolean => EdgeIndex,
              pruneZero: Boolean = true, routing: Boolean = true,
              broadcastPrefixes: Boolean = false,
              predicates: Seq[Pred] = Nil): DataFrame = {
    var cur = applyPreds(seed, plan, predicates, boundPositions = 2)
    for ((stage, s) <- plan.stages.zipWithIndex) {
      val exts = stage.map(c => Extender(c.prefixPos, c.forward, indexFor(c.inclusive)))
      cur = extendStage(cur, exts, pruneZero, routing, broadcastPrefixes)
      cur = applyPreds(cur, plan, predicates, boundPositions = s + 3)
    }
    val outCols = (0 until plan.numAttrs).map { a =>
      element_at(col("p"), plan.inverse(a) + 1).as(s"x$a")
    } :+ col("w")
    cur.select(outCols: _*)
  }

  /** Filters by every predicate that becomes FULLY BOUND exactly when the
    * prefix reaches `boundPositions` elements (earliest-stage application —
    * each predicate fires once, right where the reference's retain would). */
  private def applyPreds(df: DataFrame, plan: RelationPlan, preds: Seq[Pred],
                         boundPositions: Int): DataFrame = {
    val due = preds.filter { pr =>
      math.max(plan.inverse(pr.a), plan.inverse(pr.b)) == boundPositions - 1
    }
    due.foldLeft(df) { (acc, pr) =>
      acc.filter(pr.column(
        element_at(col("p"), plan.inverse(pr.a) + 1),
        element_at(col("p"), plan.inverse(pr.b) + 1)))
    }
  }

  /** Batch motif enumeration over a static edge set — the analog of
    * `build_motif` (/root/reference/src/motif.rs:114-117).
    * Edges: (src,dst[,w]); output (x0..x{k-1}, w), consolidated. */
  def enumerate(edges: DataFrame, motif: Seq[(Int, Int)],
                predicates: Seq[Pred] = Nil): DataFrame = {
    val index = EdgeIndex(EdgeIndex.consolidate(edges))
    val seed = index.fwd.select(array(col("k"), col("v")).as("p"), col("ew").as("w"))
    consolidateMatches(runPlan(seed, Planner.planRelation(0, motif), _ => index,
      predicates = predicates))
  }

  /** Count-only batch enumeration: (n = distinct matched bindings, total =
    * net Z-set weight) WITHOUT the per-binding consolidation shuffle.
    * Sound because batch `enumerate` runs ONE pipeline over consolidated
    * inputs — each binding appears on exactly one output row — so
    * consolidation there only drops zero-weight rows; here we filter them
    * and aggregate with a map-side-combined global agg instead. */
  def enumerateAgg(edges: DataFrame, motif: Seq[(Int, Int)],
                   predicates: Seq[Pred] = Nil): DataFrame = {
    val index = EdgeIndex(EdgeIndex.consolidate(edges))
    val seed = index.fwd.select(array(col("k"), col("v")).as("p"), col("ew").as("w"))
    runPlan(seed, Planner.planRelation(0, motif), _ => index, predicates = predicates)
      .filter(col("w") =!= 0L)
      .agg(count(lit(1)).as("n"), coalesce(sum("w"), lit(0L)).as("total"))
  }

  /** Fails fast when a consolidated edge frame is not a 0/1 Z-set —
    * factorized counting builds adjacency ARRAYS (collect_list drops
    * multiplicities), so weighted/multi edges would silently miscount.
    * The frame must be materialized (localCheckpoint/persist) by the
    * caller: the guard runs a scan, and an unmaterialized frame would pay
    * the consolidation shuffle once here and again per downstream use. */
  private[batch] def require01(consolidated: DataFrame, who: String): DataFrame = {
    require(consolidated.where(col("w") =!= 1L).isEmpty,
      s"$who requires a 0/1 edge Z-set (found rows with weight != 1)")
    consolidated
  }

  /** Factorized counting (the reference's seed-q5-lean mode,
    * /root/reference/examples/seed-q5-lean.rs:72-104): all but the LAST
    * extension stage run normally; the last attribute is never exploded —
    * per surviving prefix we count the final candidates via sorted
    * adjacency arrays + `array_intersect` and sum `w × |∩|`. This is the
    * output-volume lever for 5/6-clique-style queries whose match count
    * dwarfs the prefix count (reference README.md:150-201). Requires a 0/1
    * edge Z-set (adjacency arrays carry no multiplicities). Returns one row
    * (total: long). Predicates touching the last attribute are applied as
    * array filters before counting — still never materialized. */
  def enumerateFactorizedCount(edges: DataFrame, motif: Seq[(Int, Int)],
                               predicates: Seq[Pred] = Nil): DataFrame = {
    val plan = Planner.planRelation(0, motif)
    require(plan.numAttrs >= 3, "factorized counting needs at least one extension stage")
    // materialized once: the 0/1 guard scan, the index arms, and the
    // adjacency-array build below all read this frame
    val consolidated = require01(
      EdgeIndex.consolidate(edges).localCheckpoint(), "enumerateFactorizedCount")
    val index = EdgeIndex(consolidated)
    val seed = index.fwd.select(array(col("k"), col("v")).as("p"), col("ew").as("w"))

    // stages 0..n-2 as usual (with earliest-stage predicate application)
    var cur = applyPreds(seed, plan, predicates, boundPositions = 2)
    for ((stage, s) <- plan.stages.zipWithIndex.dropRight(1)) {
      val exts = stage.map(c => Extender(c.prefixPos, c.forward, index))
      cur = extendStage(cur, exts, pruneZero = true, routing = true)
      cur = applyPreds(cur, plan, predicates, boundPositions = s + 3)
    }

    // last stage, factorized: sorted candidate arrays per constraint key
    val lastAttrPos = plan.numAttrs - 1
    val lastStage = plan.stages.last
    def adjArrays(forward: Boolean): DataFrame = {
      val (k, v) = if (forward) ("src", "dst") else ("dst", "src")
      consolidated.groupBy(col(k).as("k"))
        .agg(sort_array(collect_list(col(v))).as("vs"))
    }
    for ((c, j) <- lastStage.zipWithIndex) {
      val a = adjArrays(c.forward)
        .select(col("k").as(s"_k$j"), col("vs").as(s"_vs$j"))
      cur = cur.join(a, element_at(col("p"), c.prefixPos + 1) === col(s"_k$j"))
        .drop(s"_k$j")
    }
    val inter = lastStage.indices.map(j => col(s"_vs$j"))
      .reduceLeft((x, y) => array_intersect(x, y))
    val lastPreds = predicates.filter(pr =>
      math.max(plan.inverse(pr.a), plan.inverse(pr.b)) == lastAttrPos)
    val filtered = lastPreds.foldLeft(inter) { (arr, pr) =>
      val (lastIsA, otherAttr) =
        if (plan.inverse(pr.a) == lastAttrPos) (true, pr.b) else (false, pr.a)
      val other = element_at(col("p"), plan.inverse(otherAttr) + 1)
      filter(arr, v => if (lastIsA) pr.column(v, other) else pr.column(other, v))
    }
    cur.select((col("w") * size(filtered).cast("long")).as("cnt"))
      .agg(coalesce(sum("cnt"), lit(0L)).as("total"))
  }

  /** Static-index, streamed-queries mode (examples/q3-lean.rs:50-66,
    * static_graph/examples/triangles.rs): treat `queries` (src,dst[,w]) as
    * relation 0's bindings and extend them against a fixed index. */
  def queryStatic(queries: DataFrame, index: EdgeIndex, motif: Seq[(Int, Int)]): DataFrame = {
    val q = EdgeIndex.norm(queries)
    val seed = q.select(array(col("src"), col("dst")).as("p"), col("w"))
    runPlan(seed, Planner.planRelation(0, motif), _ => index)
  }

  /** One incremental step — `track_motif`
    * (/root/reference/src/motif.rs:106-112) for a single batch of edge
    * deltas. For each motif relation r, seeds that relation's delta dataflow
    * with the batch; relations before r read post-batch state ("le"),
    * relations after r read pre-batch state ("lt") — the staleness
    * discipline that makes each output change appear exactly once
    * (/root/reference/examples/triangles.rs:40-48).
    * Output is NOT consolidated (different relations may touch the same
    * binding); callers aggregate or consolidate. */
  def deltaStep(deltas: DataFrame, oldIndex: EdgeIndex, newIndex: EdgeIndex,
                motif: Seq[(Int, Int)], pruneZero: Boolean = true,
                routing: Boolean = true, broadcastPrefixes: Boolean = true,
                predicates: Seq[Pred] = Nil): DataFrame = {
    val d = EdgeIndex.norm(deltas)
    val seed = d.select(array(col("src"), col("dst")).as("p"), col("w"))
    motif.indices.map { r =>
      val plan = Planner.planRelation(r, motif)
      runPlan(seed, plan, inclusive => if (inclusive) newIndex else oldIndex,
        pruneZero, routing, broadcastPrefixes, predicates)
    }.reduce(_ unionByName _)
  }

  /** Consolidates a match frame by its bindings (drops zero-weight rows). */
  def consolidateMatches(matches: DataFrame): DataFrame = {
    val bindings = matches.columns.filter(_ != "w").toSeq
    matches.groupBy(bindings.map(col): _*).agg(sum("w").as("w")).filter(col("w") =!= 0L)
  }

  /** Sum of match weights (the motif "count" under bag semantics). */
  def countMatches(matches: DataFrame): Long =
    matches.agg(coalesce(sum("w"), lit(0L))).collect()(0).getLong(0)
}
