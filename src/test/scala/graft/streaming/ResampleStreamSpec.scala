package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import ResampleStream._

/** Streaming LOCF resample: kernel == batch brute force (incl. tie,
  * boundary-exact, single-hour-key cases), boundary ties resolved across
  * micro-batch splits, and cross-micro-batch state survival. */
class ResampleStreamSpec extends AnyFunSuite with SparkTestBase {

  private val H = HourUs

  /** Batch reference: per key, hours [trunc(min)+1h, trunc(max)], LOCF
    * with (ts, tie) tie-break. */
  private def ref(evs: Seq[RsEv]): Set[(Long, Long, Double)] =
    evs.groupBy(_.key).toSeq.flatMap { case (k, es) =>
      val sorted = es.sortBy(e => (e.tsUs, e.tie))
      val lo = Math.floorDiv(sorted.map(_.tsUs).min, H) * H + H
      val hi = Math.floorDiv(sorted.map(_.tsUs).max, H) * H
      (lo to hi by H).map { h =>
        val last = sorted.filter(_.tsUs <= h).last
        (k, h, last.value)
      }
    }.toSet

  private val fixture = Seq(
    ev(1L, 10L * 60 * 1000000, 10L, 1.0),
    ev(1L, 10L * 60 * 1000000, 11L, 2.0),   // tie: id 11 wins
    ev(1L, H + 30L * 60 * 1000000, 12L, 3.0),
    ev(1L, 3 * H + 1L, 13L, 4.0),           // 1 µs past hour 3
    ev(2L, 5L * 60 * 1000000, 20L, 9.0),    // single-hour key: no grid
    ev(2L, 6L * 60 * 1000000, 21L, 8.0),
    ev(3L, H - 1L, 30L, 5.0),               // boundary-exact event
    ev(3L, H, 31L, 6.0),                    // exactly ON hour 1
    ev(3L, H, 32L, 6.5),                    // boundary TIE: id 32 wins
    ev(3L, 2 * H + 1L, 33L, 7.0))

  private def sentinels(evs: Seq[RsEv]): Seq[RsEv] = {
    val far = evs.map(_.tsUs).max + H
    Seq(ev(-1L, far, -1L, 0.0), ev(-1L, far + 1000000L, -2L, 0.0))
  }

  private def startQuery(src: MemoryStream[RsEv], name: String): StreamingQuery =
    resampleStream(src.toDS().withWatermark("ts", "1 millisecond")).toDF()
      .writeStream.format("memory").queryName(name).outputMode("append").start()

  private def collectTable(name: String): Set[(Long, Long, Double)] =
    spark.table(name).where(col("key") =!= -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed grid == batch brute force (one batch + sentinels)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[RsEv]
    val q = startQuery(src, "rs_one")
    src.addData(fixture.sortBy(e => (e.tsUs, e.tie)))
    q.processAllAvailable()
    sentinels(fixture).foreach { sv => src.addData(sv); q.processAllAvailable() }
    q.stop()
    val got = collectTable("rs_one")
    assert(got === ref(fixture))
    // hour-1 grid point for key 3 must take the larger boundary tie (6.5)
    assert(got.contains((3L, H, 6.5)))
    assert(!got.exists(_._1 == 2L), "single-hour key emits nothing")
  }

  test("state survives micro-batch splits mid-key and mid-boundary-tie") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sorted = fixture.sortBy(e => (e.tsUs, e.tie))
    val src = MemoryStream[RsEv]
    val q = startQuery(src, "rs_split")
    // one event per micro-batch — maximal state churn; in particular key
    // 3's two ts==H tied events land in DIFFERENT batches, so the hour-1
    // value is only correct if the boundary hour waits for the timeout
    sorted.foreach { e => src.addData(e); q.processAllAvailable() }
    sentinels(fixture).foreach { sv => src.addData(sv); q.processAllAvailable() }
    q.stop()
    val got = collectTable("rs_split")
    assert(got === ref(fixture))
    assert(got.contains((3L, H, 6.5)))
  }

  test("kernel directly: late-hour value excludes the flushing event; boundary waits for timeout") {
    val noEvict = Long.MaxValue
    // event at 2H+5 flushes hours 1H and 2H with the OLD value
    val evs = Seq(ev(7L, 1L, 1L, 1.5), ev(7L, 2 * H + 5L, 2L, 9.9))
    val st = new TestGroupState[RsState]
    val out = ResampleStream.process(noEvict)(7L, evs.iterator, st).toSeq
    assert(out === Seq(RsOut(7L, H, 1.5), RsOut(7L, 2 * H, 1.5)))
    assert(st.value.nextHUs === 3 * H && st.value.lastVal === 9.9)

    // an exactly-on-boundary event must NOT flush its hour on arrival...
    val st2 = new TestGroupState[RsState]
    val out2 = ResampleStream.process(noEvict)(8L,
      Seq(ev(8L, 1L, 1L, 1.0), ev(8L, H, 2L, 2.0)).iterator, st2).toSeq
    assert(out2.isEmpty, "boundary hour must wait for the timeout")
    // ...the timeout finalizes it with the latest value and KEEPS state
    // (the key may still be active — eviction is the idle horizon's job)
    st2.timedOut = true
    val out3 = ResampleStream.process(noEvict)(8L, Iterator.empty, st2).toSeq
    assert(out3 === Seq(RsOut(8L, H, 2.0)))
    assert(st2.exists, "finalizing timeout must not evict an active key")
    assert(st2.value.nextHUs === 2 * H)
    // a second timeout re-flushes nothing (idempotent)
    val out4 = ResampleStream.process(noEvict)(8L, Iterator.empty, st2).toSeq
    assert(out4.isEmpty)
    // a later event then extends the SAME grid (no restart, no gap)
    st2.timedOut = false
    val out5 = ResampleStream.process(noEvict)(8L,
      Iterator(ev(8L, 3 * H + 1L, 3L, 4.0)), st2).toSeq
    assert(out5 === Seq(RsOut(8L, 2 * H, 2.0), RsOut(8L, 3 * H, 2.0)))
  }

  test("kernel directly: idle horizon evicts, inside it state survives") {
    val horizon = 60L * 60 * 1000 // 1h in ms
    val st = new TestGroupState[RsState]
    ResampleStream.process(horizon)(9L,
      Iterator(ev(9L, 1L, 1L, 1.0)), st)
    st.timedOut = true
    st.watermarkMs = 10L // just past the event, well inside the horizon
    assert(ResampleStream.process(horizon)(9L, Iterator.empty, st).isEmpty)
    assert(st.exists, "inside the horizon the key survives")
    st.watermarkMs = horizon + 1000L // silent past the horizon
    ResampleStream.process(horizon)(9L, Iterator.empty, st)
    assert(!st.exists, "past the idle horizon the key is evicted")
  }

  /** Minimal GroupState stub for driving the kernel without a stream. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    private var st: Option[S] = None
    var timedOut: Boolean = false
    var watermarkMs: Long = 0L
    def value: S = st.get
    override def exists: Boolean = st.isDefined
    override def get: S = st.get
    override def getOption: Option[S] = st
    override def update(s: S): Unit = { st = Some(s) }
    override def remove(): Unit = { st = None }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, d: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, d: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = watermarkMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
