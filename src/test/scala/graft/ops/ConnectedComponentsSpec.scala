package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Connected components: distributed large-star/small-star == driver-side
  * union-find on random graphs, worst-case chains, singletons, and
  * parallelism invariance. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(v => v -> find(v)).toMap
  }

  private def runCc(n: Int, edges: Seq[(Long, Long)],
                    parts: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("a", "b").repartition(parts)
    val vs = (0L until n).toDF("node")
    ConnectedComponents.run(e, "a", "b", vertices = Some(vs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graph == union-find (components + singletons)") {
    val rnd = new scala.util.Random(7L)
    val n = 300
    val edges = (0 until 250).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    assert(runCc(n, edges) == unionFind(n, edges))
  }

  test("long chain (propagation worst case) collapses to one component") {
    val n = 200
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = runCc(n.toInt, chain)
    assert(got.values.toSet == Set(0L))
  }

  test("two stars sharing no node stay separate; duplicate+reversed edges ok") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val got = runCc(13, edges)
    assert(got(2L) == 1L && got(3L) == 1L)
    assert(got(11L) == 10L && got(12L) == 10L)
    assert(got(7L) == 7L) // singleton labels itself
  }

  test("parallelism invariance: identical labels at 1 and 8 partitions") {
    val rnd = new scala.util.Random(13L)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong)).filter(e => e._1 != e._2)
    assert(runCc(500, edges, parts = 1) == runCc(500, edges, parts = 8))
  }

  test("incremental absorb over chunks == one-shot run on the full edge set") {
    import spark.implicits._
    val rnd = new scala.util.Random(29L)
    val n = 400
    val edges = (0 until 350).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    // four deterministic chunks, including chunks that MERGE components
    // labeled in earlier chunks (random split guarantees cross-chunk merges)
    val chunks = edges.zipWithIndex.groupMap(_._2 % 4)(_._1)
    var labels = ConnectedComponents.run(
      chunks(0).toDF("a", "b"), "a", "b",
      vertices = Some((0L until n).toDF("node")))
    for (c <- 1 to 3)
      labels = ConnectedComponents.absorb(labels, chunks(c).toDF("a", "b"), "a", "b")
    val inc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == runCc(n, edges))
    // state is exactly one row per vertex — never the edge history
    assert(labels.count() == n)
  }

  test("absorb with an empty batch is a no-op on the labeling") {
    import spark.implicits._
    val labels = ConnectedComponents.run(
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), "a", "b",
      vertices = Some((0L until 6L).toDF("node")))
    val after = ConnectedComponents.absorb(
      labels, Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      labels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("large-star/small-star rounds preserve reachability classes") {
    val rnd = new scala.util.Random(3L)
    val n = 120
    val edges = (0 until 100).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    import spark.implicits._
    val e0 = edges.toDF("u", "v").where(col("u") =!= col("v")).distinct()
    val after = ConnectedComponents.smallStar(ConnectedComponents.largeStar(e0))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // nodes that were connected must remain connected (over surviving nodes)
    val before = unionFind(n, edges)
    val afterUf = unionFind(n, after.toSeq)
    after.flatMap(e => Seq(e._1, e._2)).foreach { v =>
      // the post-round root must be in the same original component
      assert(before(afterUf(v)) == before(v))
    }
  }
}
