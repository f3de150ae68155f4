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

/** A micro-batch of edge deltas, broadcast to every index partition:
  * `edges` is the CONSOLIDATED batch in canonical (src,dst) order — the
  * shared seed list whose indices the driver's argmin routing table refers
  * to — and fwd/rev are per-endpoint value-sorted runs supplying (a) the
  * merge-on-read "new" view for the le staleness rule and (b) the fold-in
  * data for the post-step index update. */
final class DeltaPack(
    val edges: Array[(Long, Long, Long)],
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

  def apply(raw: Array[(Long, Long, Long)]): DeltaPack = {
    // consolidate to a canonical seed list (sum weights per (src,dst),
    // drop zeros, sort) — sound by Z-set bilinearity
    val edges = raw.groupBy(e => (e._1, e._2)).iterator
      .map { case ((s, d), es) => (s, d, es.iterator.map(_._3).sum) }
      .filter(_._3 != 0L)
      .toArray.sortBy(e => (e._1, e._2))
    def group(keyOf: ((Long, Long, Long)) => Long,
              valOf: ((Long, Long, Long)) => Long): Map[Long, Run] =
      edges.groupBy(keyOf).map { case (k, es) =>
        val run = IndexState.consolidate(es.map(e => (valOf(e), e._3)))
        k -> Run(run.map(_._1), run.map(_._2), es.iterator.map(_._3).sum)
      }
    new DeltaPack(edges, group(_._1, _._2), group(_._2, _._1))
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

  /** predsOk for the final level without materializing the extended prefix:
    * the last position's value is supplied as `last`. */
  private def predsOkWithLast(rel: Int, p: Array[Long], last: Long,
                              boundPositions: Int): Boolean = {
    val prs = predTable(rel)(boundPositions - 2)
    val lastPos = boundPositions - 1
    var i = 0
    while (i < prs.length) {
      val (pa, pb, op) = prs(i)
      val a = if (pa == lastPos) last else p(pa)
      val b = if (pb == lastPos) last else p(pb)
      if (!DeltaEngine.evalOp(op, a, b)) return false
      i += 1
    }
    true
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

  import DeltaEngine.{HotMap, Pfx, Prop}

  // ---- executor-side lookups (hot replica ⊎ base shard, ⊎ broadcast delta) ----
  // Hot hub keys are checked FIRST: a scattered row lands on an arbitrary
  // partition whose shard does not hold its key; the hot replica does.

  private def degAt(shard: Shard.T, hot: HotMap, dp: DeltaPack, k: Long,
                    forward: Boolean, inclusive: Boolean): Long = {
    val h = hot.get(k)
    val base =
      if (h != null) h.deg(forward)
      else shard.get(k) match { case Some(a) => a.deg(forward); case None => 0L }
    if (inclusive) base + dp.run(k, forward).degSum else base
  }

  private def adjAt(shard: Shard.T, hot: HotMap, dp: DeltaPack, k: Long,
                    forward: Boolean, inclusive: Boolean): (Array[Long], Array[Long]) = {
    val h = hot.get(k)
    val a = if (h != null) Some(h) else shard.get(k)
    val bvs = a.map(_.vs(forward)).getOrElse(Array.empty[Long])
    val bws = a.map(_.ws(forward)).getOrElse(Array.empty[Long])
    if (!inclusive) (bvs, bws)
    else {
      val r = dp.run(k, forward)
      if (r.vs.isEmpty) (bvs, bws) else DeltaEngine.mergeRuns(bvs, bws, r.vs, r.ws)
    }
  }

  /** Routing key for a lookup on `k`: cold keys go to their shard's
    * partition; HOT (replicated) keys scatter by prefix-content hash — the
    * skew treatment the north rule requires. Without it the Zipf hubs pull
    * whole levels onto one partition and core-count scaling inverts
    * (measured: the hub partition processed ~90% of a batch's bytes). */
  private def routeKey(k: Long, hot: HotMap, p: Array[Long], salt: Int): Long =
    if (hot.containsKey(k)) DeltaEngine.scatterKey(p, salt) else k

  /** Level 0 without any prefix exchange: the seed set IS the broadcast
    * delta, so (a) cold-key degrees are computed by their owning shard
    * partition in one tiny collect job, (b) hot-key degrees come from the
    * driver's replica directly, (c) the argmin routing table (one byte-ish
    * per seed×relation) is broadcast, and (d) each partition emits exactly
    * the proposals assigned to it, in place. Replaces a parallelize + E
    * count exchanges + a propose exchange — the per-batch stage floor that
    * capped core-count scaling at small batch sizes. */
  private def seedPropose(sc: SparkContext, shards: RDD[Shard.T],
                          hot: Broadcast[HotMap], hotLocal: HotMap,
                          dp: Broadcast[DeltaPack], dpLocal: DeltaPack): RDD[Prop] = {
    val stage0 = plans.map(_.stages(0))
    val engine = this
    // (a) cold degrees, one job over the shards
    val coldDegs = shards.mapPartitionsWithIndex { (pid, it) =>
      val shard = it.next()
      val d = dp.value
      val h = hot.value
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
      var j = 0
      while (j < d.edges.length) {
        val (s0, d0, _) = d.edges(j)
        val p = Array(s0, d0)
        var r = 0
        while (r < engine.numRels) {
          if (engine.predsOk(r, p, 2)) {
            val cs = stage0(r)
            var i = 0
            while (i < cs.size) {
              val k = p(cs(i).prefixPos)
              if (!h.containsKey(k) &&
                  engine.partitioner.getPartition(k) == pid) {
                out += ((j, r, i,
                  degAt(shard, h, d, k, cs(i).forward, cs(i).inclusive)))
              }
              i += 1
            }
          }
          r += 1
        }
        j += 1
      }
      out.iterator
    }.collect()

    // (b)+(c) driver: gather every (seed, rel, ext) degree (hot from the
    // replica, cold from the collect), then argmin in extender order —
    // exactly the DataFrame engine's least(struct(deg, i)): strictly
    // smaller wins, ties keep the lowest extender id. pruneZero → -1.
    val maxE0 = stage0.map(_.size).max
    val nE = dpLocal.edges.length
    val degs = Array.fill(nE * numRels * maxE0)(0L)
    var j = 0
    while (j < nE) {
      val (s0, d0, _) = dpLocal.edges(j)
      val p = Array(s0, d0)
      var r = 0
      while (r < numRels) {
        if (predsOk(r, p, 2)) {
          val cs = stage0(r)
          var i = 0
          while (i < cs.size) {
            val k = p(cs(i).prefixPos)
            if (hotLocal.containsKey(k))
              degs((j * numRels + r) * maxE0 + i) =
                degAt(Shard.empty, hotLocal, dpLocal, k, cs(i).forward, cs(i).inclusive)
            i += 1
          }
        }
        r += 1
      }
      j += 1
    }
    coldDegs.foreach { case (cj, cr, ci, deg) =>
      degs((cj * numRels + cr) * maxE0 + ci) = deg
    }
    val routing = Array.fill(nE * numRels)(-1)
    j = 0
    while (j < nE) {
      val (s0, d0, _) = dpLocal.edges(j)
      val p = Array(s0, d0)
      var r = 0
      while (r < numRels) {
        if (predsOk(r, p, 2)) {
          val cs = stage0(r)
          var best = Long.MaxValue
          var bestI = -1
          var i = 0
          while (i < cs.size) {
            val dgi = degs((j * numRels + r) * maxE0 + i)
            if (dgi < best) { best = dgi; bestI = i }
            i += 1
          }
          if (best > 0L) routing(j * numRels + r) = bestI // pruneZero
        }
        r += 1
      }
      j += 1
    }
    val routeB = sc.broadcast(routing)

    // (d) propose in place on the assigned partition
    shards.mapPartitionsWithIndex { (pid, it) =>
      val shard = it.next()
      val d = dp.value
      val h = hot.value
      val route = routeB.value
      val out = scala.collection.mutable.ArrayBuffer.empty[Prop]
      var j = 0
      while (j < d.edges.length) {
        val (s0, d0, w) = d.edges(j)
        var r = 0
        while (r < engine.numRels) {
          val i = route(j * engine.numRels + r)
          if (i >= 0) {
            val p = Array(s0, d0)
            val cst = stage0(r)(i)
            val k = p(cst.prefixPos)
            val assigned =
              if (h.containsKey(k))
                DeltaEngine.partOf(DeltaEngine.scatterKey(p, 3), engine.numParts) == pid
              else engine.partitioner.getPartition(k) == pid
            if (assigned) {
              val (vs, ws) = adjAt(shard, h, d, k, cst.forward, cst.inclusive)
              if (vs.nonEmpty) out += Prop(r, p, w, i, vs, ws)
            }
          }
          r += 1
        }
        j += 1
      }
      out.iterator
    }
  }

  /** Count chain + propose for levels ≥ 1 (prefixes already distributed). */
  private def countPropose(shards: RDD[Shard.T], hot: Broadcast[HotMap],
                           dp: Broadcast[DeltaPack],
                           cur: RDD[Pfx], s: Int): RDD[Prop] = {
    val stages = plans.map(_.stages(s))
    val maxE = stages.map(_.size).max

    // count: thread the running argmin through one exchange per extender
    // slot (the reference's count chain, /root/reference/src/index.rs:343-384)
    var c = cur
    for (i <- 0 until maxE) {
      c = c.map { pfx =>
          val cs = stages(pfx.rel)
          val key =
            if (i < cs.size) routeKey(pfx.p(cs(i).prefixPos), hot.value, pfx.p, s * 7 + i)
            else DeltaEngine.scatterKey(pfx.p, s * 7 + i)
          (key, pfx)
        }
        .partitionBy(partitioner)
        .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
          val shard = sh.next()
          it.map { case (_, pfx) =>
            val cs = stages(pfx.rel)
            if (i < cs.size) {
              val cst = cs(i)
              val d = degAt(shard, hot.value, dp.value, pfx.p(cst.prefixPos),
                cst.forward, cst.inclusive)
              if (d < pfx.minDeg) pfx.copy(minDeg = d, minExt = i) else pfx
            } else pfx
          }
        }
    }
    c = c.filter(_.minDeg > 0L) // pruneZero (net multiplicities non-negative)

    // propose from the argmin extender's adjacency run
    var pr: RDD[Prop] = c.map { pfx =>
        val key = routeKey(pfx.p(stages(pfx.rel)(pfx.minExt).prefixPos),
          hot.value, pfx.p, s * 7 + 5)
        (key, pfx)
      }
      .partitionBy(partitioner)
      .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
        val shard = sh.next()
        it.flatMap { case (_, pfx) =>
          val cst = stages(pfx.rel)(pfx.minExt)
          val (vs, ws) = adjAt(shard, hot.value, dp.value, pfx.p(cst.prefixPos),
            cst.forward, cst.inclusive)
          if (vs.isEmpty) None
          else Some(Prop(pfx.rel, pfx.p, pfx.w, pfx.minExt, vs, ws))
        }
      }
    pr
  }

  /** Intersect chain for level `s`: validate each proposal against every
    * non-proposing extender, galloping the index run. */
  private def intersectChain(shards: RDD[Shard.T], hot: Broadcast[HotMap],
                             dp: Broadcast[DeltaPack],
                             props: RDD[Prop], s: Int): RDD[Prop] = {
    val stages = plans.map(_.stages(s))
    val maxE = stages.map(_.size).max
    var pr = props
    for (j <- 0 until maxE - 1) {
      pr = pr.map { prop =>
          val cs = stages(prop.rel)
          val key =
            if (j < cs.size - 1) {
              val o = if (j < prop.minExt) j else j + 1
              routeKey(prop.p(cs(o).prefixPos), hot.value, prop.p, s * 7 + 6 + j)
            } else DeltaEngine.scatterKey(prop.p, s * 7 + 6 + j)
          (key, prop)
        }
        .partitionBy(partitioner)
        .zipPartitions(shards, preservesPartitioning = false) { (it, sh) =>
          val shard = sh.next()
          it.flatMap { case (_, prop) =>
            val cs = stages(prop.rel)
            if (j < cs.size - 1) {
              val o = if (j < prop.minExt) j else j + 1
              val cst = cs(o)
              val (avs, aws) = adjAt(shard, hot.value, dp.value,
                prop.p(cst.prefixPos), cst.forward, cst.inclusive)
              val (nvs, nws) = DeltaEngine.intersectRuns(prop.cands, prop.candWs, avs, aws)
              if (nvs.isEmpty) None else Some(prop.copy(cands = nvs, candWs = nws))
            } else Some(prop)
          }
        }
    }
    pr
  }

  /** Explode validated level-`s` proposals into next-level prefixes. */
  private def explodeToPfx(props: RDD[Prop], s: Int): RDD[Pfx] = {
    val boundAfter = s + 3
    props.flatMap { prop =>
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
  def deltaStep(sc: SparkContext, shards: RDD[Shard.T], hot: Broadcast[HotMap],
                hotLocal: HotMap, dp: Broadcast[DeltaPack],
                dpLocal: DeltaPack): RDD[(ArraySeq[Long], Long)] = {
    val inverses = plans.map(_.inverse.toArray)
    if (numAttrs == 2) {
      // single-relation motif: the seeds ARE the matches
      val seeds = dpLocal.edges
      val nSlices = math.max(1, math.min(numParts, seeds.length / 64 + 1))
      return sc.parallelize(ArraySeq.unsafeWrapArray(seeds), nSlices)
        .flatMap { case (s, d, w) =>
          (0 until numRels).iterator
            .map(r => Pfx(r, Array(s, d), w, Long.MaxValue, -1))
            .filter(pfx => predsOk(pfx.rel, pfx.p, 2))
        }
        .map { pfx =>
          val inv = inverses(pfx.rel)
          (ArraySeq.unsafeWrapArray(Array(pfx.p(inv(0)), pfx.p(inv(1)))), pfx.w)
        }
        .reduceByKey(new HashPartitioner(numParts), _ + _)
        .filter(_._2 != 0L)
    }
    // level 0 fused over the broadcast seed set; levels ≥ 1 over the
    // distributed prefix stream
    var pr: RDD[Prop] = intersectChain(shards, hot, dp,
      seedPropose(sc, shards, hot, hotLocal, dp, dpLocal), 0)
    for (s <- 1 to numAttrs - 3) {
      val cur = explodeToPfx(pr, s - 1)
      pr = intersectChain(shards, hot, dp,
        countPropose(shards, hot, dp, cur, s), s)
    }

    // Final level: explode straight into per-target-partition PACKED blocks
    // of [x0..x{k-1}, w] longs — the consolidation exchange then moves ~P²
    // big primitive arrays instead of millions of tiny records. Measured:
    // record-at-a-time consolidation cost ~6µs/match (Kryo + per-record
    // allocation, memory-bound, no core scaling); packed blocks serialize at
    // memcpy speed with ZERO map-side allocation per match.
    val n = numAttrs
    val lastPos = n - 1
    val np = numParts
    // bounded chunk size: multi-MB blocks are G1-humongous allocations and
    // were fragmenting the heap into multi-second full-GC storms (measured
    // gc=27-42s inside single stages); 256KB chunks stay in normal regions
    val rec = n + 1
    val chunkCap = (32768 / rec) * rec
    val packed: RDD[(Int, Array[Long])] =
      pr.mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Long])]
        val bufs = new Array[Array[Long]](np)
        val lens = new Array[Int](np)
        while (it.hasNext) {
          val prop = it.next()
          val inv = inverses(prop.rel)
          var i = 0
          while (i < prop.cands.length) {
            val w = prop.w * prop.candWs(i)
            if (w != 0L) {
              val cand = prop.cands(i)
              if (predsOkWithLast(prop.rel, prop.p, cand, n)) {
                var h = 0L
                var a = 0
                while (a < n) {
                  val v = if (inv(a) == lastPos) cand else prop.p(inv(a))
                  h = h * 0x9e3779b97f4a7c15L + v + 1
                  a += 1
                }
                h ^= h >>> 32
                val pid = ((h % np) + np).toInt % np
                var buf = bufs(pid)
                if (buf == null) { buf = new Array[Long](chunkCap); bufs(pid) = buf }
                var off = lens(pid)
                a = 0
                while (a < n) {
                  buf(off) = if (inv(a) == lastPos) cand else prop.p(inv(a))
                  off += 1; a += 1
                }
                buf(off) = w
                lens(pid) = off + 1
                if (off + 1 == chunkCap) {
                  out += ((pid, buf)); bufs(pid) = null; lens(pid) = 0
                }
              }
            }
            i += 1
          }
        }
        var pid = 0
        while (pid < np) {
          if (lens(pid) > 0)
            out += ((pid, java.util.Arrays.copyOf(bufs(pid), lens(pid))))
          pid += 1
        }
        out.iterator
      }
    packed
      .partitionBy(DeltaEngine.identityPartitioner(np))
      .mapPartitions({ it =>
        val m = new java.util.HashMap[ArraySeq[Long], java.lang.Long](1 << 20)
        while (it.hasNext) {
          val block = it.next()._2
          var off = 0
          while (off < block.length) {
            val key = ArraySeq.unsafeWrapArray(
              java.util.Arrays.copyOfRange(block, off, off + n))
            val w = block(off + n)
            val prev = m.get(key)
            if (prev == null) m.put(key, w)
            else {
              val s = prev.longValue() + w
              if (s == 0L) m.remove(key) else m.put(key, java.lang.Long.valueOf(s))
            }
            off += n + 1
          }
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => (e.getKey, e.getValue.longValue()))
          .filter(_._2 != 0L)
      }, preservesPartitioning = false)
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
  /** Broadcast replica of the hottest keys' adjacency (Zipf hubs): lookups
    * on these keys run wherever the row already is, so no partition ever
    * concentrates hub traffic. Maintained by [[FastGraphState]] in lockstep
    * with the shards (same merge rules, copy-on-write snapshot per batch). */
  type HotMap = java.util.HashMap[Long, Adj]

  /** Deterministic balance key for rows whose lookup key is hot-replicated:
    * mixes the prefix content so records spread evenly; `salt` decorrelates
    * consecutive hops. */
  def scatterKey(p: Array[Long], salt: Int): Long = {
    var h = salt * 0x9e3779b97f4a7c15L + 0x165667b19e3779f9L
    var i = 0
    while (i < p.length) {
      h = (h ^ p(i)) * 0xff51afd7ed558ccdL
      h ^= h >>> 33
      i += 1
    }
    h
  }

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

  /** Partition of a raw long key, matching HashPartitioner over boxed
    * Longs: nonNegativeMod(Long.hashCode(k), n). */
  def partOf(k: Long, n: Int): Int = {
    val h = (k ^ (k >>> 32)).toInt
    val m = h % n
    if (m < 0) m + n else m
  }

  /** Partitioner for pre-routed (pid, block) pairs. */
  def identityPartitioner(n: Int): org.apache.spark.Partitioner =
    new org.apache.spark.Partitioner {
      override def numPartitions: Int = n
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }

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
