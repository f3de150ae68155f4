package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Label propagation: brute-force round replay, convergence on known
  * community structure, and determinism under repartitioning. */
class LabelPropSpec extends AnyFunSuite with SparkTestBase {

  /** Driver-side reference of the same synchronous rule. */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size).toSeq
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int, parts: Int): Map[Long, Long] = {
    import spark.implicits._
    LabelProp.run(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("synchronous rounds == driver-side brute force, any partitioning") {
    val rnd = new scala.util.Random(7L)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    for (rounds <- Seq(1, 3, 5); parts <- Seq(1, 7))
      assert(run(edges, rounds, parts) == ref(edges, rounds),
        s"rounds=$rounds parts=$parts")
  }

  test("two disconnected triangles converge to per-community min labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val got = run(edges, rounds = 4, parts = 3)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("modularity audit: exact integers on the bridged-K4 graph") {
    import spark.implicits._
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4b = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = k4a ++ k4b ++ Seq((4L, 11L))
    val got = LabelProp.modularityOf(
        edges.toDF("src", "dst").repartition(3), "src", "dst", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // 13 undirected edges → 2m = 26; two communities of 4 nodes, each
    // with 6 intra edges; bridge endpoints carry one extra half-edge:
    // d_c = 4 nodes × 3 + 1 = 13 each; q_num = 26·12 − 13² = 143
    assert(got.map(t => (t._2, t._3, t._4, t._5)) ==
      Seq((4L, 6L, 13L, 143L), (4L, 6L, 13L, 143L)), s"got $got")
    // Q = Σ q_num / (2m)² = 286/676 ≈ 0.423 — positive, as a genuine
    // community split must be
    assert(got.map(_._5).sum > 0)
  }

  test("bridged communities: the bridge does not merge dense sides (4 rounds)") {
    // two K4s joined by one edge — each side's plurality stays internal
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4b = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = run(k4a ++ k4b ++ Seq((4L, 11L)), rounds = 4, parts = 2)
    val aLbls = (1L to 4L).map(got).toSet
    val bLbls = (11L to 14L).map(got).toSet
    assert(aLbls.size == 1 && bLbls.size == 1 && aLbls != bLbls,
      s"expected two communities, got $got")
  }
}
