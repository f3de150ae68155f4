package graft.fast

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ArraySeq
import graft.SparkTestBase
import graft.incr.GraphState
import graft.plan.Planner

/** Effort-bounded emission + spillable consolidation: the two mechanisms
  * that let enumerations and batch deltas whose output exceeds task memory
  * complete (the reference's bounded activation loop + `expend` accounting,
  * /root/reference/src/extender.rs:259-262, src/index.rs:227-236). */
class SpillConsolidatorSpec extends AnyFunSuite with SparkTestBase {

  private def refConsolidate(recs: Seq[Array[Long]], n: Int): Map[Seq[Long], Long] =
    recs.foldLeft(Map.empty[Seq[Long], Long]) { (m, r) =>
      val k = r.take(n).toSeq
      m + (k -> (m.getOrElse(k, 0L) + r(n)))
    }.filter(_._2 != 0L)

  test("spilling consolidation equals in-memory consolidation (with cancellations)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 3, 4); maxEntries <- Seq(1, 4, 16)) {
      // duplicate-heavy key space so merges sum across spill runs, with
      // explicit cancelling pairs so zero-net keys must vanish
      val recs = (0 until 2000).map { _ =>
        Array.fill(n)(rnd.nextInt(40).toLong) :+ (rnd.nextInt(5) - 2).toLong
      } ++ (0 until 50).flatMap { i =>
        val k = Array.fill(n)(100L + i)
        Seq(k :+ 3L, k :+ -3L)
      }
      val c = new SpillConsolidator(n, maxEntries)
      // feed as packed blocks of varying chunking
      recs.grouped(17).foreach { g =>
        val block = g.flatten.toArray
        var off = 0
        while (off < block.length) { c.add(block, off); off += n + 1 }
      }
      assert(c.spillCount > 0, s"cap $maxEntries should have spilled")
      val got = c.result().map { case (k, w) => (k.toSeq, w) }.toMap
      assert(got == refConsolidate(recs, n), s"n=$n cap=$maxEntries")
    }
  }

  test("offset quicksort == reference lexicographic sort (large random + adversarial)") {
    val rnd = new scala.util.Random(19)
    for ((n, size) <- Seq((3, 100000), (1, 50000), (5, 20000))) {
      val rec = n + 1
      // distinct keys (mirrors the hash-map source); sorted + reversed +
      // random sections to poke pivot selection
      val keys = (0 until size).map(i => Array.fill(n)(rnd.nextLong())).distinctBy(_.toSeq)
      val ordered = keys.sortBy(_.toSeq)(math.Ordering.Implicits.seqOrdering)
      for (arrangement <- Seq(keys, ordered, ordered.reverse)) {
        val buf = new Array[Long](arrangement.size * rec)
        val idx = new Array[Int](arrangement.size)
        arrangement.zipWithIndex.foreach { case (k, i) =>
          System.arraycopy(k, 0, buf, i * rec, n); buf(i * rec + n) = i.toLong
          idx(i) = i * rec
        }
        SpillConsolidator.sortOffsets(buf, idx, n)
        val got = idx.map(off => (0 until n).map(j => buf(off + j)).toSeq).toSeq
        assert(got == ordered.map(_.toSeq), s"n=$n size=${arrangement.size}")
      }
    }
  }

  test("no-spill fast path equals reference too") {
    val recs = Seq(Array(1L, 2L, 5L), Array(1L, 2L, -5L), Array(3L, 4L, 2L))
    val c = new SpillConsolidator(2, 1 << 20)
    recs.foreach(r => c.add(r, 0))
    assert(c.spillCount == 0)
    assert(c.result().map { case (k, w) => (k.toSeq, w) }.toMap ==
      refConsolidate(recs, 2))
  }

  test("boundedIt yields chunks before consuming all input (bounded live output)") {
    var consumed = 0
    val input = Iterator.range(0, 100).map { i => consumed += 1; i }
    // each element fills exactly one chunk for partition 0
    val out = DeltaEngine.boundedIt(4, input) { (_, bb) =>
      bb.reserve(0, 32768)
      bb.advance(0, 32768)
    }
    val first = out.next()
    assert(first._1 == 0 && first._2.length == 32768)
    assert(consumed <= 3,
      s"first chunk must be available without draining the input (consumed=$consumed)")
    assert(out.size == 99 && consumed == 100) // and the rest still arrives
  }

  test("BoundedStage yields chunks incrementally over packed input") {
    var consumed = 0
    // 50 input blocks of one 3-long record each; each record emits a full chunk
    val blocks = Iterator.range(0, 50).map { i =>
      consumed += 1
      (0, Array(i.toLong, 0L, 0L))
    }
    val stage = new DeltaEngine.BoundedStage(2, blocks) {
      protected def processSome(block: Array[Long], off0: Int): Int = {
        var off = off0
        while (off < block.length && bb.completedChunks == 0) {
          bb.reserve(1, 32768); bb.advance(1, 32768)
          off += 3
        }
        off
      }
    }
    val first = stage.next()
    assert(first._1 == 1)
    assert(consumed <= 3, s"consumed=$consumed")
    assert(stage.size == 49 && consumed == 50)
  }

  test("planted hub-edge batch: huge per-batch delta set absorbs with bounded memory") {
    // a hub node connected to everything: every streamed edge (a,b) between
    // hub neighbors closes triangles through the hub, so a modest batch
    // explodes into a delta set far larger than the batch — the streaming
    // OOM shape. Forced-tiny consolidation cap ⇒ every reduce task spills;
    // output must still equal the DataFrame engine.
    val prev = sys.props.get("spark.graft.consolidate.maxEntries")
    sys.props("spark.graft.consolidate.maxEntries") = "16"
    try {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("src", LongType),
        StructField("dst", LongType), StructField("w", LongType)))
      def df(edges: Seq[(Long, Long, Long)]) = spark.createDataFrame(
        edges.map(e => Row(e._1, e._2, e._3)).asJava, schema)
      val hub = 0L
      val n = 120
      val preload = (1 to n).flatMap(i =>
        Seq((hub, i.toLong, 1L), (i.toLong, hub, 1L)))
      val rnd = new scala.util.Random(83L)
      val batch = (0 until 300).map { _ =>
        var a = 0L; var b = 0L
        while (a == b) { a = 1L + rnd.nextInt(n); b = 1L + rnd.nextInt(n) }
        (a, b, 1L)
      }
      val slow = new GraphState(spark, Planner.triangle)
      val fast = new FastGraphState(spark, Planner.triangle, numParts = 4)
      slow.initialize(df(preload)); fast.initialize(df(preload))
      val expect = slow.applyBatch(0L, df(batch)).collect()
        .map(_.toSeq.map(_.asInstanceOf[Long])).sortBy(_.mkString(","))
      val got = fast.applyBatch(0L, df(batch)).collect()
        .map(_.toSeq.map(_.asInstanceOf[Long])).sortBy(_.mkString(","))
      assert(got.length == expect.length && got.toSeq == expect.toSeq)
      // the stress is real: deltas ≫ batch rows
      assert(expect.length > 3 * batch.size)
      slow.close(); fast.close()
    } finally {
      prev match {
        case Some(v) => sys.props("spark.graft.consolidate.maxEntries") = v
        case None => sys.props.remove("spark.graft.consolidate.maxEntries")
      }
    }
  }

  test("fast engine matches the DataFrame engine under a forced-tiny spill cap") {
    val prev = sys.props.get("spark.graft.consolidate.maxEntries")
    sys.props("spark.graft.consolidate.maxEntries") = "8"
    try {
      val rnd = new scala.util.Random(11)
      val slow = new GraphState(spark, Planner.triangle)
      val fast = new FastGraphState(spark, Planner.triangle, numParts = 3, maxTail = 5)
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("src", LongType),
        StructField("dst", LongType), StructField("w", LongType)))
      for (id <- 0 until 4) {
        val batch = (0 until 300).map { _ =>
          var s = 0L; var d = 0L
          while (s == d) { s = rnd.nextInt(25).toLong; d = rnd.nextInt(25).toLong }
          Row(s, d, 1L)
        }
        val b = spark.createDataFrame(batch.asJava, schema)
        val expect = slow.applyBatch(id.toLong, b).collect()
          .map(_.toSeq.map(_.asInstanceOf[Long])).sortBy(_.mkString(","))
        val got = fast.applyBatch(id.toLong, b).collect()
          .map(_.toSeq.map(_.asInstanceOf[Long])).sortBy(_.mkString(","))
        assert(got.toSeq == expect.toSeq, s"batch $id diverged under spill cap 8")
      }
      fast.close(); slow.close()
    } finally {
      prev match {
        case Some(v) => sys.props("spark.graft.consolidate.maxEntries") = v
        case None => sys.props.remove("spark.graft.consolidate.maxEntries")
      }
    }
  }
}
