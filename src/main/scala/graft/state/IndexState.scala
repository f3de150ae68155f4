package graft.state

/** Per-key sorted-run index helpers — the JVM-side mirror of the
  * reference's galloping search and per-key consolidation, for use inside
  * typed state operators (e.g. a flatMapGroupsWithState group's adjacency).
  *
  * `gallop` reimplements the semantics of `advance`
  * (/root/reference/src/lib.rs:101-127): count the prefix of a sorted array
  * satisfying a monotone predicate in O(log n) via exponential probe +
  * binary shrink. `intersectSorted` is the adaptive scan-vs-gallop
  * intersection the reference's naive/static crates use (cutoff |big|/4,
  * /root/reference/static_graph/src/graph.rs:110).
  */
object IndexState {

  /** Index of the first element of sorted `xs(from..)` with value ≥ `bound`
    * (i.e. `from` + count of leading elements < bound). */
  def gallop(xs: Array[Long], bound: Long, from: Int = 0): Int = {
    val n = xs.length
    if (from >= n || xs(from) >= bound) return from
    // exponential probe: invariant xs(lo) < bound
    var lo = from
    var step = 1
    while (lo + step < n && xs(lo + step) < bound) { lo += step; step <<= 1 }
    // binary shrink in (lo, min(lo+step, n))
    var hi = math.min(lo + step, n - 1)
    if (xs(hi) < bound) return hi + 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < bound) lo = mid else hi = mid
    }
    lo + 1
  }

  /** Intersection of two sorted Long arrays, galloping the big side when
    * the small side is < |big|/4 (adaptive cutoff like the reference). */
  def intersectSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (small, big) = if (a.length <= b.length) (a, b) else (b, a)
    val out = Array.newBuilder[Long]
    if (small.length < big.length / 4) {
      var off = 0
      var i = 0
      while (i < small.length && off < big.length) {
        off = gallop(big, small(i), off)
        if (off < big.length && big(off) == small(i)) { out += small(i); off += 1 }
        i += 1
      }
    } else {
      var i = 0; var j = 0
      while (i < small.length && j < big.length) {
        if (small(i) < big(j)) i += 1
        else if (small(i) > big(j)) j += 1
        else { out += small(i); i += 1; j += 1 }
      }
    }
    out.result()
  }

  /** Consolidates (value, weight) pairs: sort by value, sum weights, drop
    * zeros — the reference's `consolidate_tail`
    * (/root/reference/src/index.rs:197-219). */
  def consolidate(pairs: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (pairs.isEmpty) return pairs
    val sorted = pairs.sortBy(_._1)
    val out = Array.newBuilder[(Long, Long)]
    var curV = sorted(0)._1
    var curW = 0L
    for ((v, w) <- sorted) {
      if (v != curV) { if (curW != 0L) out += ((curV, curW)); curV = v; curW = 0L }
      curW += w
    }
    if (curW != 0L) out += ((curV, curW))
    out.result()
  }
}
