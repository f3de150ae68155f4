package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the one-pass funnel machine to the batch min-chain: same per-user
  * depth under chunked ts-ordered delivery and within-batch shuffling,
  * including the strict-inequality tie cases (a click at exactly the view's
  * timestamp must NOT count; a purchase at exactly the click's timestamp
  * must NOT count) and out-of-stage-order events (purchase before any
  * click is ignored, a later qualifying purchase still counts). */
class FunnelStreamSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L
  private val steps = Seq("view", "click", "purchase")

  private def ev(u: Long, ms: Long, tag: String): FunnelStream.Ev =
    FunnelStream.Ev(u, new Timestamp(base + ms), tag)

  // u1: full funnel. u2: click ties the view ts (excluded) then a later
  // click + purchase tying THAT click (purchase excluded → depth 2).
  // u3: purchase before any click (ignored), then click, then purchase →
  // depth 3. u4: click with no view ever → depth 0, emits nothing.
  // u5: view only. u6: two views, click after the first → depth 2.
  private val all: Seq[FunnelStream.Ev] = Seq(
    ev(1, 1000, "view"), ev(1, 2000, "click"), ev(1, 3000, "purchase"),
    ev(2, 1000, "view"), ev(2, 1000, "click"), ev(2, 5000, "click"),
    ev(2, 5000, "purchase"),
    ev(3, 1000, "view"), ev(3, 2000, "purchase"), ev(3, 3000, "click"),
    ev(3, 4000, "purchase"),
    ev(4, 1000, "click"), ev(4, 2000, "purchase"),
    ev(5, 1000, "view"),
    ev(6, 1000, "view"), ev(6, 1500, "view"), ev(6, 1200, "click")
  ).sortBy(_.ts.getTime)

  /** Batch min-chain depths computed directly. */
  private def expected: Map[Long, Int] =
    all.groupBy(_.userId).flatMap { case (u, evs) =>
      val vts = evs.filter(_.tag == "view").map(_.ts.getTime).minOption
      val cts = vts.flatMap(v => evs.filter(e => e.tag == "click" &&
        e.ts.getTime > v).map(_.ts.getTime).minOption)
      val pts = cts.flatMap(c => evs.filter(e => e.tag == "purchase" &&
        e.ts.getTime > c).map(_.ts.getTime).minOption)
      val d = Seq(vts, cts, pts).takeWhile(_.isDefined).size
      if (d > 0) Some(u -> d) else None
    }

  private def run(batches: Seq[Seq[FunnelStream.Ev]]): Map[Long, Int] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[FunnelStream.Ev]
    val out = FunnelStream.funnelStream(
      src.toDS().withWatermark("ts", "30 minutes"), steps, gapMs = 60000L).toDF()
    val name = s"graft_funnel_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val far = all.map(_.ts.getTime).max + 3600000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(ev(-1L, far - base + 1800000L + off, "view"))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).where(col("user_id") =!= -1L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("fixture depths are the intended tie/order cases") {
    assert(expected == Map(1L -> 3, 2L -> 2, 3L -> 3, 5L -> 1, 6L -> 2))
  }

  test("chunked ts-ordered delivery equals the batch min-chain") {
    assert(run(all.grouped(5).toSeq) == expected)
  }

  test("within-batch shuffling cannot change the result") {
    val byChunk = all.grouped(6).toSeq.map(c => new scala.util.Random(11).shuffle(c))
    assert(run(byChunk) == expected)
  }

  test("one event per batch (cross-batch state carry)") {
    assert(run(all.map(Seq(_))) == expected)
  }
}
