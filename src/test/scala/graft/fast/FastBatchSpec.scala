package graft.fast

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.batch.GenericJoin
import graft.plan.Planner

/** Pins the fast engine's batch-enumeration mode to the DataFrame engine:
  * identical (bindings, weight) sets for every motif/predicate combination,
  * including the gallop range-pushdown paths and hot-replica scatter
  * routing. */
class FastBatchSpec extends AnyFunSuite with SparkTestBase {

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("w", LongType)))

  private def df(edges: Seq[(Long, Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      edges.map(e => Row(e._1, e._2, e._3)).asJava, edgeSchema)
  }

  /** Deterministic random multigraph with some repeated and negative rows
    * (exercises input consolidation). */
  private def randomEdges(nodes: Int, m: Int, seed: Long): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).map { _ =>
      var s = 0L; var d = 0L
      while (s == d) { s = rnd.nextInt(nodes).toLong; d = rnd.nextInt(nodes).toLong }
      val w = rnd.nextInt(10) match {
        case 0 => -1L // occasional retraction row
        case 1 => 2L  // multiplicity
        case _ => 1L
      }
      (s, d, w)
    }
  }

  private def sortedRows(frame: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
    frame.collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSeq.sortBy(_.mkString(","))

  /** Runs `body` once per execution regime: the zero-exchange broadcast-
    * local pipeline (gate wide open) and the node-sharded exchange pipeline
    * (gate closed) — every equality below pins BOTH against the DataFrame
    * oracle. */
  private def bothRegimes(body: String => Unit): Unit = {
    val saved = FastBatch.localIndexMaxEdges
    try {
      FastBatch.localIndexMaxEdges = Long.MaxValue
      body("local")
      FastBatch.localIndexMaxEdges = 0L
      body("sharded")
    } finally FastBatch.localIndexMaxEdges = saved
  }

  private def check(motif: Seq[(Int, Int)], preds: Seq[GenericJoin.Pred],
                    edges: Seq[(Long, Long, Long)], parts: Int, hotKeys: Int = -1): Unit = {
    val e = df(edges)
    val expect = sortedRows(GenericJoin.enumerate(e, motif, preds))
    bothRegimes { regime =>
      val got = sortedRows(FastBatch.enumerate(e, motif, preds, numParts = parts,
        hotKeys = hotKeys))
      assert(got == expect,
        s"motif=$motif preds=$preds parts=$parts hotKeys=$hotKeys regime=$regime")
    }
  }

  test("batch fast == sql: triangle on random weighted multigraph") {
    check(Planner.triangle, Nil, randomEdges(40, 600, 7L), parts = 5)
  }

  test("batch fast == sql: cycle3") {
    check(Planner.cycle3, Nil, randomEdges(35, 500, 11L), parts = 3)
  }

  test("batch fast == sql: diamond (mixed 1- and 2-constraint stages)") {
    // K4 minus (0,3): stage for x2 has two constraints, stage for x3 has
    // two but from non-seed attrs — a shape no clique/cycle test covers
    check(Planner.diamond, Nil, randomEdges(35, 550, 53L), parts = 4)
  }

  test("enumerateAgg diamond matches full enumeration") {
    val e = df(randomEdges(30, 500, 59L))
    val full = GenericJoin.enumerate(e, Planner.diamond).collect()
    bothRegimes { regime =>
      val row = FastBatch.enumerateAgg(e, Planner.diamond, numParts = 3).collect()(0)
      assert(row.getLong(0) == full.length, s"regime=$regime")
      assert(row.getLong(1) == full.map(r => r.getLong(r.length - 1)).sum, s"regime=$regime")
    }
  }

  test("batch fast == sql: clique4 (two extension levels)") {
    check(Planner.clique4, Nil, randomEdges(25, 500, 13L), parts = 4)
  }

  test("batch fast == sql: clique4 ordered (gallop range pushdown, both sides)") {
    check(Planner.clique4, GenericJoin.ordered(4), randomEdges(25, 500, 17L), parts = 4)
  }

  test("batch fast == sql: clique5 (three extension levels)") {
    check(Planner.clique5, Nil, randomEdges(14, 400, 37L), parts = 4)
  }

  test("batch fast == sql: cliqueHat with mixed !=/< predicates") {
    check(Planner.cliqueHat,
      Seq(GenericJoin.Pred(1, 4, "!="), GenericJoin.Pred(2, 4, "<")),
      randomEdges(20, 450, 19L), parts = 4)
  }

  test("batch fast == sql: descending and >= range predicates") {
    check(Planner.triangle,
      Seq(GenericJoin.Pred(0, 2, ">"), GenericJoin.Pred(1, 2, ">=")),
      randomEdges(30, 500, 23L), parts = 3)
  }

  test("batch fast == sql: hot replica forced on (every key hot) and off") {
    val edges = randomEdges(20, 400, 29L)
    check(Planner.triangle, Nil, edges, parts = 4, hotKeys = 1000) // all hot
    check(Planner.triangle, Nil, edges, parts = 4, hotKeys = 0)    // none hot
  }

  test("batch fast == sql: single-edge motif (no extension stage)") {
    val edges = randomEdges(15, 120, 31L)
    val e = df(edges)
    val expect = sortedRows(GenericJoin.enumerate(e, Seq((0, 1))))
    val got = sortedRows(FastBatch.enumerate(e, Seq((0, 1)), numParts = 3))
    assert(got == expect)
  }

  test("queryStatic fast == sql: streamed queries against a static index") {
    import graft.batch.EdgeIndex
    val edges = randomEdges(30, 500, 61L)
    val queries = randomEdges(30, 120, 67L)
    val e = df(edges)
    val q = df(queries)
    val idx = EdgeIndex(EdgeIndex.consolidate(e))
    val expect = sortedRows(GenericJoin.queryStatic(q, idx, Planner.triangle))
    bothRegimes { regime =>
      val got = sortedRows(FastBatch.queryStatic(q, e, Planner.triangle, numParts = 4))
      assert(got == expect, s"regime=$regime")
    }
  }

  test("enumerateAgg matches full enumeration counts") {
    val edges = randomEdges(30, 500, 37L)
    val e = df(edges)
    val full = GenericJoin.enumerate(e, Planner.triangle).collect()
    bothRegimes { regime =>
      val row = FastBatch.enumerateAgg(e, Planner.triangle, numParts = 4).collect()(0)
      assert(row.getLong(0) == full.length, s"regime=$regime")
      assert(row.getLong(1) == full.map(r => r.getLong(r.length - 1)).sum, s"regime=$regime")
    }
  }

  test("enumerateAgg with ordered predicates matches DataFrame agg") {
    val edges = randomEdges(25, 500, 41L)
    val e = df(edges)
    val expect = GenericJoin.enumerateAgg(e, Planner.clique4, GenericJoin.ordered(4))
      .collect()(0)
    bothRegimes { regime =>
      val got = FastBatch.enumerateAgg(e, Planner.clique4, GenericJoin.ordered(4),
        numParts = 4).collect()(0)
      assert(got.getLong(0) == expect.getLong(0), s"regime=$regime")
      assert(got.getLong(1) == expect.getLong(1), s"regime=$regime")
    }
  }

  test("enumerateRowCount equals enumeration size in both regimes") {
    val e = df(randomEdges(30, 500, 71L))
    val full = GenericJoin.enumerate(e, Planner.triangle).count()
    bothRegimes { regime =>
      val n = FastBatch.enumerateRowCount(e, Planner.triangle, numParts = 4)
      assert(n == full, s"regime=$regime")
    }
  }

  test("result survives source release (eager materialization)") {
    val e = df(randomEdges(25, 400, 43L))
    val out = FastBatch.enumerate(e, Planner.triangle, numParts = 4)
    // consume twice, after FastBatch already unpersisted its internal state
    assert(out.count() == out.count())
  }
}
