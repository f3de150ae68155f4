package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** PageRank and BFS vs plain-Scala mirrors of the exact integer recurrences
  * (no tolerance anywhere — the point of the integer forms is bit
  * equality), plus structural properties. */
class GraphAlgosSpec extends AnyFunSuite with SparkTestBase {

  private val edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L),
    (5L, 6L), (6L, 5L)) // separate 2-cycle component

  private def edgeDf = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def mirrorPageRank(iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(n =>
        n -> (3L * PageRank.Scale / 20 + 17L * inflow.getOrElse(n, 0L) / 20)).toMap
    }
    r
  }

  test("pagerank == integer mirror at every iteration count 0..4") {
    for (iters <- 0 to 4) {
      val got = PageRank.run(edgeDf, "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == mirrorPageRank(iters), s"iters=$iters")
    }
  }

  test("pagerank ranks the cycle hub above the dangling feeder") {
    val r = mirrorPageRank(5)
    // node 1 receives from 3 and 4; node 4 receives nothing
    assert(r(1L) > r(4L))
    // every rank carries at least the teleport mass
    assert(r.values.forall(_ >= 3L * PageRank.Scale / 20))
  }

  private def mirrorBfs(seeds: Set[Long], maxHops: Int): Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = edges.flatMap(e =>
        dist.get(e._1).map(d => e._2 -> (d + 1)))
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    dist
  }

  test("bfs distances == mirror, seeds at 0, other component unreached") {
    import spark.implicits._
    for (hops <- 0 to 3) {
      val got = Bfs.distances(edgeDf, "src", "dst",
          Seq(4L).toDF("n"), maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == mirrorBfs(Set(4L), hops), s"hops=$hops")
    }
    // 4 → 1 → {2,3}; the 5/6 component is never reached
    val d3 = mirrorBfs(Set(4L), 3)
    assert(d3 == Map(4L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("multi-source bfs takes the minimum over seeds") {
    import spark.implicits._
    val got = Bfs.distances(edgeDf, "src", "dst",
        Seq(4L, 3L).toDF("n"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == mirrorBfs(Set(4L, 3L), 2))
    assert(got(1L) == 1L) // via seed 3, not 4→1's longer path tie
  }

  private def mirrorPpr(seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(n => n -> (if (seeds(n)) PageRank.Scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(n => n -> ((if (seeds(n)) 3L * PageRank.Scale / 20 else 0L) +
        17L * inflow.getOrElse(n, 0L) / 20)).toMap
    }
    r
  }

  test("personalized pagerank == mirror; all-seeds case degenerates to run()") {
    import spark.implicits._
    for (iters <- 0 to 3) {
      val got = PageRank.personalized(edgeDf, "src", "dst",
          Seq(4L, 5L).toDF("n"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == mirrorPpr(Set(4L, 5L), iters), s"iters=$iters")
    }
    // the un-seeded 1-2-3 cycle drains to zero mass (no teleport there)
    val m = mirrorPpr(Set(5L, 6L), 4)
    assert(m(5L) > 0 && m(1L) < PageRank.Scale / 10)
    // every node a seed == plain PageRank
    val all = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val ppr = PageRank.personalized(edgeDf, "src", "dst", all.toDF("n"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = PageRank.run(edgeDf, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  // ---------------- k-core ----------------

  // K4 on {1,2,3,4} plus a tail 4-5-6: at k=2 the tail peels over two
  // cascading rounds (6 falls first, exposing 5)
  private val kcEdges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  private def mirrorKCore(k: Int, rounds: Int): Map[Long, Long] = {
    val und = kcEdges.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
      .filter(p => p._1 != p._2).distinct
    var alive = und.map(_._1).toSet
    for (_ <- 1 to rounds) {
      val deg = und.filter(p => alive(p._1) && alive(p._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      alive = deg.filter(_._2 >= k).keySet
    }
    und.filter(p => alive(p._1) && alive(p._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("kcore == peel mirror at every round count, and the cascade converges") {
    import spark.implicits._
    val df = kcEdges.toDF("src", "dst")
    for (r <- 1 to 4) {
      val got = KCore.run(df, "src", "dst", k = 2, rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == mirrorKCore(2, r), s"rounds=$r")
    }
    // converged by round 2: node 6 peels in round 1, node 5 in round 2
    assert(mirrorKCore(2, 1).contains(5L) && !mirrorKCore(2, 2).contains(5L))
    assert(mirrorKCore(2, 2) == mirrorKCore(2, 3))
    assert(mirrorKCore(2, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcore at k=3 keeps only the K4; k=4 empties; reversed dups harmless") {
    import spark.implicits._
    // duplicate + reversed edges must not inflate degrees (distinct view)
    val df = (kcEdges ++ kcEdges.map(e => (e._2, e._1))).toDF("src", "dst")
    val k3 = KCore.run(df, "src", "dst", k = 3, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(k3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(KCore.run(df, "src", "dst", k = 4, rounds = 4).isEmpty)
  }

  private def mirrorLcc(es: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val und = es.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nbrs.map { case (n, ns) =>
      val deg = ns.size.toLong
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(a, b) => nbrs(a)(b) }.toLong
      val lcc = if (deg < 2) 0L else (2000L * tri) / (deg * (deg - 1))
      n -> (deg, tri, lcc)
    }.toMap
  }

  test("clustering coefficient == brute-force mirror on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val es = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(e => e._1 != e._2)
    val got = ClusteringCoeff.run(es.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == mirrorLcc(es))
  }

  test("clustering coefficient structural pins: K4 is 1000, a path is 0") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val gotK4 = ClusteringCoeff.run(k4.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotK4 == Set((3L, 3L, 1000L))) // every node: deg 3, 3 triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val gotPath = ClusteringCoeff.run(path.toDF("src", "dst"), "src", "dst")
    assert(gotPath.collect().forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }
}
