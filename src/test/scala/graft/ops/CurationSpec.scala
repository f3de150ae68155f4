package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sim.Embeddings
import graft.transcripts.Trajectories

/** Curation-pipeline additions: edit-distance pair verification,
  * leakage-safe splits, kNN-graph construction, trajectory dedup. */
class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- Dedup.verifyPairs ----

  private val vDocs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"),   // identical to 1 → lev 0
    (3L, "alpha beta gamma deltaX"),  // one insert vs 1 → lev 1
    (4L, "completely different text entirely unrelated words"),
    (5L, "alpha beta gamma delZZ"))   // two substitutions vs 1 → lev 2

  test("verifyPairs: bounded distance verifies inside the band, -1 outside") {
    val docs = vDocs.toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.verifyPairs(docs, pairs, "id", "text", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // lev(1,4) far exceeds the band → bounded scan bails with -1
    assert(got === Set((1L, 2L, 0L, 1L), (1L, 3L, 1L, 1L),
      (1L, 4L, -1L, 0L), (1L, 5L, 2L, 1L)))
  }

  test("verifyPairs: band boundary is inclusive at maxDist, exclusive above") {
    val docs = vDocs.toDF("id", "text")
    val pairs = Seq((1L, 3L), (1L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.verifyPairs(docs, pairs, "id", "text", maxDist = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((3L, 1L, 1L), (5L, -1L, 0L))) // dist 2 > band 1 → -1
  }

  // ---- Splits.leakageSafeSplit ----

  test("leakageSafeSplit: clusters never straddle, singletons hash independently") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Splits.leakageSafeSplit(docs, "doc_id", pairs, trainPermille = 800)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.keySet === (1L to 10L).toSet)
    // cluster members carry the representative's component AND side
    assert(got(2L) === got(1L) && got(3L) === got(1L) && got(1L)._1 === 1L)
    assert(got(8L) === got(7L) && got(7L)._1 === 7L)
    // every assignment equals the representative-hash formula
    val cut = Splits.P * 800 / 1000
    got.foreach { case (_, (keep, split)) =>
      val expect = if ((keep * 48271L + 7L) % Splits.P < cut) "train" else "val"
      assert(split === expect)
    }
  }

  test("leakageSafeSplit: permille 0 and 1000 are total") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val all = Splits.leakageSafeSplit(docs, "doc_id", pairs, trainPermille = 1000)
      .select("split").distinct().as[String].collect().toSet
    val none = Splits.leakageSafeSplit(docs, "doc_id", pairs, trainPermille = 0)
      .select("split").distinct().as[String].collect().toSet
    assert(all === Set("train") && none === Set("val"))
  }

  // ---- Embeddings.knnGraph ----

  private def vec(seed: Long): Seq[Float] =
    (0 until 64).map { i =>
      val h = graft.gen.TranscriptGen.splitmix64(seed * 1000003L + i)
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }

  test("knnGraph matches a driver-side rerank of the LSH candidate pairs") {
    val twin = vec(1L)
    val rows = Seq(1L -> twin, 2L -> twin) ++ (3L to 10L).map(s => s -> vec(s))
    val df = rows.toDF("vec_id", "embedding")
    val k = 3
    val got = Embeddings.knnGraph(df, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // reference: same candidate pairs, reranked in plain Scala
    val pairs = Embeddings.lshCosinePairs(df, threshold = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (pairs.map(p => (p._1, p._2, p._3)) ++ pairs.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1).flatMap { case (src, ns) =>
        ns.toSeq.sortBy(n => (-n._3, n._2)).take(k).zipWithIndex
          .map { case ((_, nbr, cos), i) => (src, i + 1L, nbr, cos) }
      }.toSet
    assert(got.toSet === expect)
    // the identical twin shares every bucket → mutual rank-1 at cos 1.0
    val byKey = got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byKey((1L, 1L)) === ((2L, 1.0)) && byKey((2L, 1L)) === ((1L, 1.0)))
  }

  // ---- Trajectories.dedup ----

  test("trajectory dedup groups identical action sequences only, any row order") {
    val turns = Seq(
      // A and B: same sequence, different timestamps/ids
      (100L, 10L, 1L, "x"), (100L, 20L, 2L, "y"), (100L, 30L, 3L, "z"),
      (200L, 15L, 7L, "x"), (200L, 25L, 8L, "y"), (200L, 95L, 9L, "z"),
      // C: same actions, different ORDER — must not merge
      (300L, 10L, 4L, "x"), (300L, 20L, 5L, "z"), (300L, 30L, 6L, "y"),
      // D: prefix of A — must not merge
      (400L, 10L, 11L, "x"), (400L, 20L, 12L, "y"))
      .toDF("conv", "ts", "event_id", "action")
      .repartition(7) // order-free: assembly sorts inside the aggregate
    val got = Trajectories.dedup(turns, "conv", "action", col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((100L, 100L, 2L), (200L, 100L, 2L),
      (300L, 300L, 1L), (400L, 400L, 1L)))
  }

  test("trajectory dedup orders by (ts, tie) — tie column breaks equal timestamps") {
    val turns = Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), // same ts: event_id orders a|b
      (2L, 10L, 2L, "b"), (2L, 10L, 3L, "a")) // same ts: event_id orders b|a
      .toDF("conv", "ts", "event_id", "action")
    val got = Trajectories.dedup(turns, "conv", "action", col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 2L))) // a|b vs b|a: distinct groups
  }
}
