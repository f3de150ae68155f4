package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.AsofStream.{AsofEv, AsofHit}

/** Streaming as-of: the fMGWS form over shuffled input must equal a
  * brute-force mirror of the batch (ts, side, tie) total-order semantics,
  * every left exactly once, with the latest-right summary surviving
  * watermark eviction and key quiescence. */
class AsofStreamSpec extends AnyFunSuite with SparkTestBase {

  private def left(key: Long, tsMs: Long, id: Long) =
    AsofEv(key, new Timestamp(tsMs), 1, id, 0L, 0.0)
  private def right(key: Long, tsMs: Long, id: Long, v: Double) =
    AsofEv(key, new Timestamp(tsMs), 0, id, id, v)

  /** Mirror of the batch AsofJoin order: rights before lefts at equal ts,
    * largest right tie wins a (key, ts) tie. */
  private def mirror(events: Seq[AsofEv]): Set[(Long, Long, Long, Option[Long], Option[Double])] =
    events.groupBy(_.key).flatMap { case (k, es) =>
      val ord = es.sortBy(e => (e.ts.getTime, e.side, e.tie))
      var best: Option[(Long, Double)] = None
      ord.flatMap { e =>
        if (e.side == 0) { best = Some((e.pId, e.pVal)); None }
        else Some((e.tie, k, e.ts.getTime, best.map(_._1), best.map(_._2)))
      }
    }.toSet

  private def fixture(n: Int, keys: Int, seed: Long): Seq[AsofEv] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = rnd.nextInt(keys).toLong
      val ts = 100000L + rnd.nextInt(500) * 1000L
      if (rnd.nextBoolean()) left(k, ts, i.toLong)
      else right(k, ts, i.toLong, (i % 17) / 4.0)
    }
  }

  test("stream over shuffled input == order mirror, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixture(300, 4, 11L)
    val mem = MemoryStream[AsofEv]
    val out = AsofStream.asofStream(
      mem.toDF().withWatermark("ts", "30 seconds").as[AsofEv])
    val q = out.writeStream.format("memory").queryName("asof_test")
      .outputMode("append").start()
    try {
      val sorted = events.sortBy(e => (e.ts.getTime, e.side, e.tie))
      val shuffler = new scala.util.Random(5)
      for (chunk <- sorted.grouped(50)) {
        mem.addData(shuffler.shuffle(chunk.toList): _*)
        q.processAllAvailable()
      }
      // finalize quiescent keys through the event-time-timeout path only
      val flushTs = sorted.last.ts.getTime + 600000L
      mem.addData(left(99L, flushTs, 100000L))
      q.processAllAvailable()
      mem.addData(left(99L, flushTs + 120000L, 200000L))
      q.processAllAvailable()

      val got = spark.table("asof_test").as[AsofHit].collect()
        .filter(_.key != 99L)
        .map(h => (h.leftId, h.key, h.ts.getTime, h.viewId, h.viewValue))
      assert(got.length == got.toSet.size, "duplicate emissions")
      assert(got.toSet == mirror(events))
      assert(got.nonEmpty)
      // non-vacuity: some lefts matched and some predate any right
      assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
    } finally q.stop()
  }

  test("summary survives eviction: a left long after its right still joins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsofEv]
    val out = AsofStream.asofStream(
      mem.toDF().withWatermark("ts", "1 millisecond").as[AsofEv])
    val q = out.writeStream.format("memory").queryName("asof_evict")
      .outputMode("append").start()
    try {
      mem.addData(right(1L, 10000L, 1L, 2.5))
      q.processAllAvailable()
      // watermark passes far beyond the right; its Item is evicted into
      // the summary long before this left arrives
      mem.addData(left(2L, 900000L, 50L))
      q.processAllAvailable()
      mem.addData(left(1L, 1000000L, 51L))
      q.processAllAvailable()
      mem.addData(left(2L, 2000000L, 52L)) // advance wm past both lefts
      mem.addData(left(1L, 2000000L, 53L))
      q.processAllAvailable()
      mem.addData(left(2L, 3000000L, 54L))
      mem.addData(left(1L, 3000000L, 55L))
      q.processAllAvailable()
      val got = spark.table("asof_evict").as[AsofHit].collect()
        .map(h => h.leftId -> h.viewId).toMap
      assert(got(51L).contains(1L), s"late left lost the summary: $got")
      assert(got(50L).isEmpty, "key 2 must not see key 1's right")
    } finally q.stop()
  }

  test("tie semantics: right at equal ts visible, largest right id wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      right(1L, 50000L, 10L, 1.0), right(1L, 50000L, 11L, 2.0),
      left(1L, 50000L, 12L), left(1L, 40000L, 13L))
    assert(mirror(events) == Set(
      (12L, 1L, 50000L, Some(11L), Some(2.0)),
      (13L, 1L, 40000L, None, None)))
    val mem = MemoryStream[AsofEv]
    val out = AsofStream.asofStream(
      mem.toDF().withWatermark("ts", "1 millisecond").as[AsofEv])
    val q = out.writeStream.format("memory").queryName("asof_tie")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(left(9L, 999000L, 500L))
      q.processAllAvailable()
      mem.addData(left(9L, 1999000L, 501L))
      q.processAllAvailable()
      val got = spark.table("asof_tie").as[AsofHit].collect()
        .filter(_.key == 1L)
        .map(h => (h.leftId, h.key, h.ts.getTime, h.viewId, h.viewValue)).toSet
      assert(got == mirror(events))
    } finally q.stop()
  }
}
