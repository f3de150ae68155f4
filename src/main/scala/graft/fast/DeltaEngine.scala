package graft.fast

import org.apache.spark.HashPartitioner
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import scala.collection.immutable.ArraySeq
import graft.batch.GenericJoin.Pred
import graft.plan.Planner
import graft.plan.Planner.RelationPlan
import graft.state.IndexState

/** Per-node adjacency state: consolidated, value-sorted neighbor runs with
  * signed multiplicities in both directions, plus cached signed degrees —
  * the Spark-executor-resident form of the reference's per-worker
  * forward/reverse index pair (/root/reference/src/motif.rs:49-65). */
final class Adj(
    val fwdVs: Array[Long], val fwdWs: Array[Long], val degFwd: Long,
    val revVs: Array[Long], val revWs: Array[Long], val degRev: Long) extends Serializable {
  def vs(forward: Boolean): Array[Long] = if (forward) fwdVs else revVs
  def ws(forward: Boolean): Array[Long] = if (forward) fwdWs else revWs
  def deg(forward: Boolean): Long = if (forward) degFwd else degRev
}

/** One node-sharded index partition: an immutable HAMT so per-batch updates
  * are O(touched-keys × log n) persistent inserts with structural sharing —
  * never an O(|V|) rebuild. */
object Shard {
  type T = scala.collection.immutable.HashMap[Long, Adj]
  val empty: T = scala.collection.immutable.HashMap.empty
}

/** A micro-batch of consolidated edge deltas, pre-grouped per endpoint and
  * value-sorted, broadcast to every index partition. Supplies (a) the
  * merge-on-read "new" view for the le staleness rule and (b) the fold-in
  * data for the post-step index update. */
final class DeltaPack(
    val fwd: Map[Long, DeltaPack.Run],
    val rev: Map[Long, DeltaPack.Run]) extends Serializable {
  def run(k: Long, forward: Boolean): DeltaPack.Run =
    (if (forward) fwd else rev).getOrElse(k, DeltaPack.emptyRun)
  def keys: Iterator[Long] = fwd.keysIterator ++ rev.keysIterator
}

object DeltaPack {
  /** Sorted (v, w) run for one key plus its net degree contribution. */
  final case class Run(vs: Array[Long], ws: Array[Long], degSum: Long) extends Serializable
  val emptyRun: Run = Run(Array.empty, Array.empty, 0L)

  def apply(edges: Array[(Long, Long, Long)]): DeltaPack = {
    def group(keyOf: ((Long, Long, Long)) => Long,
              valOf: ((Long, Long, Long)) => Long): Map[Long, Run] =
      edges.groupBy(keyOf).map { case (k, es) =>
        val run = IndexState.consolidate(es.map(e => (valOf(e), e._3)))
        k -> Run(run.map(_._1), run.map(_._2), es.iterator.map(_._3).sum)
      }
    new DeltaPack(group(_._1, _._2), group(_._2, _._1))
  }
}

/** Worst-case-optimal delta-query step over node-sharded executor state,
  * with NO per-batch Catalyst planning.
  *
  * Why this exists: the DataFrame form of `deltaStep`
  * ([[graft.batch.GenericJoin.deltaStep]]) re-derives and re-optimizes an
  * ~18-join plan on the driver every micro-batch — measured 3-6 s of
  * single-threaded work per batch, which inverted core-count scaling
  * (local[32] slower than local[8], BENCH_r01). Here each batch is a fixed
  * pipeline of narrow RDD stages against a persisted, hash-partitioned
  * index — the Spark analog of the reference's timely-dataflow workers
  * exchanging prefixes between per-worker indices
  * (/root/reference/src/lib.rs:64-92). Per-batch driver cost is a few
  * milliseconds of task scheduling; all real work is distributed, so
  * throughput scales with cores. This is the documented
  * per-partition-imperative escape hatch: the logic (gallop intersection
  * against mutable keyed state reused across batches) has no declarative
  * DataFrame form with constant plan cost.
  *
  * Semantics are EXACTLY [[graft.batch.GenericJoin.deltaStep]] (pinned by
  * FastEngineSpec): for each motif relation r, seed that relation's delta
  * dataflow with the batch; constraints from relations before r read
  * post-batch state ("le", base merged on-the-fly with the broadcast
  * delta), relations after r read pre-batch state ("lt") — each output
  * change appears exactly once. Extension = count → argmin → propose →
  * intersect per level, ties to the lowest extender id, zero-degree
  * prefixes pruned; inline predicates fire at the earliest bound level.
  */
final class DeltaEngine(
    val motif: Seq[(Int, Int)],
    val predicates: Seq[Pred] = Nil,
    val numParts: Int) extends Serializable {

  val plans: IndexedSeq[RelationPlan] = Planner.planAll(motif)
  val numAttrs: Int = plans.head.numAttrs
  val numRels: Int = motif.size
  val partitioner = new HashPartitioner(numParts)

  /** predTable(rel)(boundPositions - 2) = predicates fully bound exactly at
    * that prefix length, as (posA, posB, opCode). */
  private val predTable: IndexedSeq[IndexedSeq[Array[(Int, Int, Int)]]] =
    plans.map { plan =>
      (2 to numAttrs).map { bound =>
        predicates.collect {
          case pr if math.max(plan.inverse(pr.a), plan.inverse(pr.b)) == bound - 1 =>
            (plan.inverse(pr.a), plan.inverse(pr.b), DeltaEngine.opCode(pr.op))
        }.toArray
      }.toIndexedSeq
    }

  private def predsOk(rel: Int, p: Array[Long], boundPositions: Int): Boolean = {
    val prs = predTable(rel)(boundPositions - 2)
    var i = 0
    while (i < prs.length) {
      val (pa, pb, op) = prs(i)
      if (!DeltaEngine.evalOp(op, p(pa), p(pb))) return false
      i += 1
    }
    true
  }

  import DeltaEngine.{Pfx, Prop}

  // ---- executor-side lookups (base shard ⊎ broadcast delta) ----

  private def degAt(shard: Shard.T, dp: DeltaPack, k: Long,
                    forward: Boolean, inclusive: Boolean): Long = {
    val base = shard.get(k) match { case Some(a) => a.deg(forward); case None => 0L }
    if (inclusive) base + dp.run(k, forward).degSum else base
  }

  private def adjAt(shard: Shard.T, dp: DeltaPack, k: Long,
                    forward: Boolean, inclusive: Boolean): (Array[Long], Array[Long]) = {
    val a = shard.get(k)
    val bvs = a.map(_.vs(forward)).getOrElse(Array.empty[Long])
    val bws = a.map(_.ws(forward)).getOrElse(Array.empty[Long])
    if (!inclusive) (bvs, bws)
    else {
      val r = dp.run(k, forward)
      if (r.vs.isEmpty) (bvs, bws) else DeltaEngine.mergeRuns(bvs, bws, r.vs, r.ws)
    }
  }

  /** One extension level: count chain → pruneZero → propose → intersects →
    * explode (+ inline predicates). `s` is the stage index (binds prefix
    * position s+2). */
  private def level(shards: RDD[Shard.T], dp: Broadcast[DeltaPack],
                    cur: RDD[Pfx], s: Int): RDD[Pfx] = {
    val stages = plans.map(_.stages(s))
    val maxE = stages.map(_.size).max
    val boundAfter = s + 3

    // count: thread the running argmin through one exchange per extender
    // slot (the reference's count chain, /root/reference/src/index.rs:343-384)
    var c = cur
    for (i <- 0 until maxE) {
      c = c.map { pfx =>
          val cs = stages(pfx.rel)
          val key = if (i < cs.size) pfx.p(cs(i).prefixPos) else pfx.p(0)
          (key, pfx)
        }
        .partitionBy(partitioner)
        .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
          val shard = sh.next()
          it.map { case (k, pfx) =>
            val cs = stages(pfx.rel)
            if (i < cs.size) {
              val cst = cs(i)
              val d = degAt(shard, dp.value, k, cst.forward, cst.inclusive)
              if (d < pfx.minDeg) pfx.copy(minDeg = d, minExt = i) else pfx
            } else pfx
          }
        }
    }
    c = c.filter(_.minDeg > 0L) // pruneZero (net multiplicities non-negative)

    // propose from the argmin extender's adjacency run
    var pr: RDD[Prop] = c.map { pfx =>
        (pfx.p(stages(pfx.rel)(pfx.minExt).prefixPos), pfx)
      }
      .partitionBy(partitioner)
      .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
        val shard = sh.next()
        it.flatMap { case (k, pfx) =>
          val cst = stages(pfx.rel)(pfx.minExt)
          val (vs, ws) = adjAt(shard, dp.value, k, cst.forward, cst.inclusive)
          if (vs.isEmpty) None
          else Some(Prop(pfx.rel, pfx.p, pfx.w, pfx.minExt, vs, ws.clone()))
        }
      }

    // intersect against every non-proposing extender, galloping the index run
    for (j <- 0 until maxE - 1) {
      pr = pr.map { prop =>
          val cs = stages(prop.rel)
          if (j < cs.size - 1) {
            val o = if (j < prop.minExt) j else j + 1
            (prop.p(cs(o).prefixPos), prop)
          } else (prop.p(0), prop) // single-extender relation: pass through
        }
        .partitionBy(partitioner)
        .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
          val shard = sh.next()
          it.flatMap { case (k, prop) =>
            val cs = stages(prop.rel)
            if (j < cs.size - 1) {
              val o = if (j < prop.minExt) j else j + 1
              val cst = cs(o)
              val (avs, aws) = adjAt(shard, dp.value, k, cst.forward, cst.inclusive)
              val (nvs, nws) = DeltaEngine.intersectRuns(prop.cands, prop.candWs, avs, aws)
              if (nvs.isEmpty) None else Some(prop.copy(cands = nvs, candWs = nws))
            } else Some(prop)
          }
        }
    }

    // explode + earliest-stage predicates
    pr.flatMap { prop =>
      val out = Vector.newBuilder[Pfx]
      var i = 0
      while (i < prop.cands.length) {
        val w = prop.w * prop.candWs(i)
        if (w != 0L) {
          val p2 = java.util.Arrays.copyOf(prop.p, prop.p.length + 1)
          p2(prop.p.length) = prop.cands(i)
          if (predsOk(prop.rel, p2, boundAfter))
            out += Pfx(prop.rel, p2, w, Long.MaxValue, -1)
        }
        i += 1
      }
      out.result()
    }
  }

  /** Runs one batch's delta step. Returns the CONSOLIDATED motif match
    * deltas, un-permuted to original attribute order: (bindings x0..x{k-1},
    * net weight ≠ 0). */
  def deltaStep(sc: SparkContext, shards: RDD[Shard.T], dp: Broadcast[DeltaPack],
                seeds: Array[(Long, Long, Long)]): RDD[(ArraySeq[Long], Long)] = {
    val nSlices = math.max(1, math.min(numParts, seeds.length / 64 + 1))
    var cur: RDD[Pfx] = sc.parallelize(ArraySeq.unsafeWrapArray(seeds), nSlices)
      .flatMap { case (s, d, w) =>
        (0 until numRels).iterator
          .map(r => Pfx(r, Array(s, d), w, Long.MaxValue, -1))
          .filter(pfx => predsOk(pfx.rel, pfx.p, 2))
      }
    for (s <- 0 until numAttrs - 2) cur = level(shards, dp, cur, s)
    cur.map { pfx =>
        val inv = plans(pfx.rel).inverse
        val out = new Array[Long](numAttrs)
        var a = 0
        while (a < numAttrs) { out(a) = pfx.p(inv(a)); a += 1 }
        (ArraySeq.unsafeWrapArray(out), pfx.w)
      }
      .reduceByKey(new HashPartitioner(numParts), _ + _)
      .filter(_._2 != 0L)
  }

  /** Folds the broadcast delta into the sharded index (copy-on-write per
    * touched key — the reference's `Index::update`,
    * /root/reference/src/index.rs:226-260). Partitioning preserved. */
  def updateShards(shards: RDD[Shard.T], dp: Broadcast[DeltaPack]): RDD[Shard.T] =
    shards.mapPartitionsWithIndex({ (pid, it) =>
      val shard = it.next()
      val d = dp.value
      var next = shard
      val touched = d.keys.filter(k => partitioner.getPartition(k) == pid).toSet
      for (k <- touched) {
        val old = next.getOrElse(k, DeltaEngine.emptyAdj)
        val fr = d.run(k, forward = true)
        val rr = d.run(k, forward = false)
        val (fvs, fws) =
          if (fr.vs.isEmpty) (old.fwdVs, old.fwdWs)
          else DeltaEngine.mergeRuns(old.fwdVs, old.fwdWs, fr.vs, fr.ws)
        val (rvs, rws) =
          if (rr.vs.isEmpty) (old.revVs, old.revWs)
          else DeltaEngine.mergeRuns(old.revVs, old.revWs, rr.vs, rr.ws)
        val adj = new Adj(fvs, fws, old.degFwd + fr.degSum,
          rvs, rws, old.degRev + rr.degSum)
        next =
          if (adj.fwdVs.isEmpty && adj.revVs.isEmpty) next.removed(k)
          else next.updated(k, adj)
      }
      Iterator.single(next)
    }, preservesPartitioning = true)

  /** Builds sharded state from a consolidated edge RDD. */
  def buildShards(edges: RDD[(Long, Long, Long)]): RDD[Shard.T] =
    edges.flatMap { case (s, d, w) =>
      Iterator((s, (d, w, true)), (d, (s, w, false)))
    }
      .partitionBy(partitioner)
      .mapPartitions({ it =>
        val fwd = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
        val rev = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
        for ((k, (v, w, isFwd)) <- it) {
          val m = if (isFwd) fwd else rev
          m.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) += ((v, w))
        }
        var shard = Shard.empty
        for (k <- (fwd.keySet ++ rev.keySet)) {
          val f = IndexState.consolidate(fwd.getOrElse(k, Nil).toArray)
          val r = IndexState.consolidate(rev.getOrElse(k, Nil).toArray)
          val adj = new Adj(
            f.map(_._1), f.map(_._2), f.iterator.map(_._2).sum,
            r.map(_._1), r.map(_._2), r.iterator.map(_._2).sum)
          if (adj.fwdVs.nonEmpty || adj.revVs.nonEmpty) shard = shard.updated(k, adj)
        }
        Iterator.single(shard)
      }, preservesPartitioning = true)

  /** Empty sharded state (numParts empty maps, correctly partitioned). */
  def emptyShards(sc: SparkContext): RDD[Shard.T] =
    sc.parallelize(Seq.empty[(Long, (Long, Long, Boolean))], numParts)
      .partitionBy(partitioner)
      .mapPartitions(_ => Iterator.single(Shard.empty), preservesPartitioning = true)
}

object DeltaEngine {
  /** Prefix in flight: relation id, bound values (reordered positions),
    * Z-set weight, and the running (min degree, argmin extender).
    * Top-level (NOT inner to the engine) so shuffled records never drag an
    * `$outer` engine reference through serialization. */
  final case class Pfx(rel: Int, p: Array[Long], w: Long, minDeg: Long, minExt: Int)

  /** Proposed-but-unexploded extension set: the factorized intermediate the
    * reference also carries (proposals stay a list until validated). */
  final case class Prop(rel: Int, p: Array[Long], w: Long, minExt: Int,
                        cands: Array[Long], candWs: Array[Long])

  val emptyAdj = new Adj(Array.empty, Array.empty, 0L, Array.empty, Array.empty, 0L)

  def opCode(op: String): Int = op match {
    case "<" => 0; case "<=" => 1; case ">" => 2; case ">=" => 3; case "!=" => 4
    case other => throw new IllegalArgumentException(s"unsupported predicate op: $other")
  }
  def evalOp(op: Int, a: Long, b: Long): Boolean = op match {
    case 0 => a < b; case 1 => a <= b; case 2 => a > b; case 3 => a >= b; case _ => a != b
  }

  /** Merges two consolidated value-sorted (v, w) runs, summing weights on
    * equal values and dropping zeros. */
  def mergeRuns(vs1: Array[Long], ws1: Array[Long],
                vs2: Array[Long], ws2: Array[Long]): (Array[Long], Array[Long]) = {
    val vs = new Array[Long](vs1.length + vs2.length)
    val ws = new Array[Long](vs1.length + vs2.length)
    var i = 0; var j = 0; var o = 0
    while (i < vs1.length && j < vs2.length) {
      if (vs1(i) < vs2(j)) { vs(o) = vs1(i); ws(o) = ws1(i); i += 1; o += 1 }
      else if (vs1(i) > vs2(j)) { vs(o) = vs2(j); ws(o) = ws2(j); j += 1; o += 1 }
      else {
        val w = ws1(i) + ws2(j)
        if (w != 0L) { vs(o) = vs1(i); ws(o) = w; o += 1 }
        i += 1; j += 1
      }
    }
    while (i < vs1.length) { vs(o) = vs1(i); ws(o) = ws1(i); i += 1; o += 1 }
    while (j < vs2.length) { vs(o) = vs2(j); ws(o) = ws2(j); j += 1; o += 1 }
    (java.util.Arrays.copyOf(vs, o), java.util.Arrays.copyOf(ws, o))
  }

  /** Weighted intersection of a candidate run against an index run —
    * galloping the index side when candidates are few (the reference's
    * adaptive intersect, /root/reference/static_graph/src/graph.rs:110).
    * Output weight = candW × indexW. */
  def intersectRuns(cvs: Array[Long], cws: Array[Long],
                    avs: Array[Long], aws: Array[Long]): (Array[Long], Array[Long]) = {
    if (cvs.isEmpty || avs.isEmpty) return (Array.empty, Array.empty)
    val vs = new Array[Long](math.min(cvs.length, avs.length))
    val ws = new Array[Long](vs.length)
    var o = 0
    if (cvs.length < avs.length / 4) {
      var i = 0; var off = 0
      while (i < cvs.length && off < avs.length) {
        off = IndexState.gallop(avs, cvs(i), off)
        if (off < avs.length && avs(off) == cvs(i)) {
          val w = cws(i) * aws(off)
          if (w != 0L) { vs(o) = cvs(i); ws(o) = w; o += 1 }
          off += 1
        }
        i += 1
      }
    } else {
      var i = 0; var j = 0
      while (i < cvs.length && j < avs.length) {
        if (cvs(i) < avs(j)) i += 1
        else if (cvs(i) > avs(j)) j += 1
        else {
          val w = cws(i) * aws(j)
          if (w != 0L) { vs(o) = cvs(i); ws(o) = w; o += 1 }
          i += 1; j += 1
        }
      }
    }
    (java.util.Arrays.copyOf(vs, o), java.util.Arrays.copyOf(ws, o))
  }
}
