package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import ResampleStream._

/** Streaming LOCF resample: kernel == batch brute force (incl. tie,
  * boundary-exact, single-hour-key cases), and cross-micro-batch state
  * (a key's events split across batches must emit identically). */
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
    RsEv(1L, 10L * 60 * 1000000, 10L, 1.0),
    RsEv(1L, 10L * 60 * 1000000, 11L, 2.0),   // tie: id 11 wins
    RsEv(1L, H + 30L * 60 * 1000000, 12L, 3.0),
    RsEv(1L, 3 * H + 1L, 13L, 4.0),           // 1 µs past hour 3
    RsEv(2L, 5L * 60 * 1000000, 20L, 9.0),    // single-hour key: no grid
    RsEv(2L, 6L * 60 * 1000000, 21L, 8.0),
    RsEv(3L, H - 1L, 30L, 5.0),               // boundary-exact event
    RsEv(3L, H, 31L, 6.0),                    // exactly ON hour 1
    RsEv(3L, 2 * H + 1L, 32L, 7.0))

  test("streamed grid == batch brute force (one batch)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[RsEv]
    val q = resampleStream(src.toDS()).toDF().writeStream
      .format("memory").queryName("rs_one").outputMode("append").start()
    src.addData(fixture.sortBy(e => (e.tsUs, e.tie)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("rs_one").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === ref(fixture))
    // hour-1 grid point for key 3 must take the ON-boundary event (6.0)
    assert(got.contains((3L, H, 6.0)))
    assert(!got.exists(_._1 == 2L), "single-hour key emits nothing")
  }

  test("state survives micro-batch splits mid-key") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sorted = fixture.sortBy(e => (e.tsUs, e.tie))
    val src = MemoryStream[RsEv]
    val q = resampleStream(src.toDS()).toDF().writeStream
      .format("memory").queryName("rs_split").outputMode("append").start()
    // one event per micro-batch — maximal state churn
    sorted.foreach { e => src.addData(e); q.processAllAvailable() }
    q.stop()
    val got = spark.table("rs_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === ref(fixture))
  }

  test("kernel directly: late-hour value excludes the flushing event") {
    // event at 2H+5 flushes hours 1H and 2H with the OLD value
    val evs = Seq(RsEv(7L, 1L, 1L, 1.5), RsEv(7L, 2 * H + 5L, 2L, 9.9))
    val st = new TestGroupState[RsState]
    val out = ResampleStream.process(7L, evs.iterator, st).toSeq
    assert(out === Seq(RsOut(7L, H, 1.5), RsOut(7L, 2 * H, 1.5)))
    assert(st.value.nextHUs === 3 * H && st.value.lastVal === 9.9)
  }

  /** Minimal GroupState stub for driving the kernel without a stream. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    private var st: Option[S] = None
    def value: S = st.get
    override def exists: Boolean = st.isDefined
    override def get: S = st.get
    override def getOption: Option[S] = st
    override def update(s: S): Unit = { st = Some(s) }
    override def remove(): Unit = { st = None }
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, d: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, d: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
