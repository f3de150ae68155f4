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
}
