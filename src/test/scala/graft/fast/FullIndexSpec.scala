package graft.fast

import org.scalatest.funsuite.AnyFunSuite

/** Pins the primitive-array [[DeltaEngine.buildFullIndex]] (round-6
  * optimization: parallel long arrays + in-place (key,value) quicksort +
  * consolidating merge walk) against an independent boxed reference
  * implementation, on duplicate-heavy multigraphs with cancelling and
  * zero weights — the exact consolidation contract of
  * IndexState.consolidate (sorted runs, summed duplicates, zeros
  * dropped, keys with both sides empty omitted). */
class FullIndexSpec extends AnyFunSuite {

  private def refIndex(edges: Seq[(Long, Long, Long)])
      : Map[Long, (Seq[(Long, Long)], Long, Seq[(Long, Long)], Long)] = {
    def runs(pairs: Seq[(Long, Long)]): (Seq[(Long, Long)], Long) = {
      val c = pairs.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq
        .filter(_._2 != 0L).sortBy(_._1)
      (c, c.map(_._2).sum)
    }
    val keys = (edges.map(_._1) ++ edges.map(_._2)).distinct
    keys.flatMap { k =>
      val (f, df) = runs(edges.filter(_._1 == k).map(e => (e._2, e._3)))
      val (r, dr) = runs(edges.filter(_._2 == k).map(e => (e._1, e._3)))
      if (f.isEmpty && r.isEmpty) None
      else Some(k -> (f, df, r, dr))
    }.toMap
  }

  test("buildFullIndex equals boxed reference on duplicate-heavy multigraphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 400
      // heavy key duplication (small id space), multi-edges, negative and
      // cancelling weights, plus explicit exact-cancel pairs
      val base = (0 until n).map { _ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong, (rnd.nextInt(5) - 2).toLong)
      }
      val cancels = (0 until 10).flatMap { i =>
        Seq((100L + i, 200L + i, 7L), (100L + i, 200L + i, -7L))
      }
      val edges = base ++ cancels
      val got = DeltaEngine.buildFullIndex(edges.iterator)
      val want = refIndex(edges)
      import scala.jdk.CollectionConverters._
      assert(got.keySet.asScala.map(_.toLong) == want.keySet, s"trial $trial key sets")
      for ((k, (f, df, r, dr)) <- want) {
        val a = got.get(k)
        assert(a.fwdVs.toSeq.zip(a.fwdWs.toSeq) == f, s"trial $trial fwd run of $k")
        assert(a.revVs.toSeq.zip(a.revWs.toSeq) == r, s"trial $trial rev run of $k")
        assert(a.degFwd == df && a.degRev == dr, s"trial $trial degrees of $k")
      }
    }
  }

  test("sortByKeyValue sorts parallel arrays by composite key with duplicates") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 31, 32, 33, 1000, 5000)) {
      val k = Array.fill(n)(rnd.nextInt(8).toLong)
      val v = Array.fill(n)(rnd.nextInt(8).toLong)
      val w = Array.tabulate(n)(_.toLong)
      val want = (0 until n).map(i => (k(i), v(i), w(i))).sortBy(t => (t._1, t._2))
      DeltaEngine.sortByKeyValue(k, v, w, n)
      val got = (0 until n).map(i => (k(i), v(i), w(i)))
      // payload permutation within equal (k,v) groups is free; compare the
      // sorted key/value sequence exactly and the payload as a multiset
      assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)), s"n=$n order")
      assert(got.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet).toMap ==
        want.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet).toMap, s"n=$n payload")
    }
  }
}
