package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.Patterns.{Ev, PatMatch}

/** The transformWithState CEP kernel must emit exactly the fMGWS form's
  * rows — same watermark finalization, same exactly-once mark, same
  * duplicate/late handling — while storing its buffer in incremental TWS
  * column families (RocksDB-only). */
class PatternsTwsSpec extends AnyFunSuite with SparkTestBase {

  private def ev(key: Long, tsMs: Long, id: Long, tag: String) =
    Ev(key, new Timestamp(tsMs), id, tag)

  private def deterministicEvents(n: Int, keys: Int, seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val tags = Vector("view", "click", "purchase", "error")
    (0 until n).map { i =>
      ev(rnd.nextInt(keys).toLong, 100000L + rnd.nextInt(600) * 1000L, i.toLong,
        tags(rnd.nextInt(tags.size)))
    }
  }

  private def runTws(events: Seq[Ev], steps: Seq[String], span: Long,
      name: String): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = PatternsTws.detectStream(
      mem.toDF().withWatermark("ts", "30 seconds").as[Ev], steps, span)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val sorted = events.sortBy(e => (e.ts.getTime, e.evId))
      val shuffler = new scala.util.Random(7)
      for (chunk <- sorted.grouped(60)) {
        mem.addData(shuffler.shuffle(chunk.toList): _*)
        q.processAllAvailable()
      }
      // flush via an UNRELATED key: quiescent keys must emit through the
      // TWS timer path, not piggyback on their own new data
      val flushTs = sorted.last.ts.getTime + 10 * 60 * 1000L
      mem.addData(ev(99L, flushTs, 100000L, "noop"))
      q.processAllAvailable()
      mem.addData(ev(99L, flushTs + 120000L, 200000L, "noop"))
      q.processAllAvailable()
      spark.table(name).as[PatMatch].collect()
        .map(m => (m.key, m.startTs.getTime, m.endTs.getTime, m.startId)).toSeq
    } finally q.stop()
  }

  test("TWS stream == batch form over final data, exactly once (RocksDB)") {
    import spark.implicits._
    val steps = Seq("view", "click")
    val span = 60000L
    val events = deterministicEvents(300, 4, 37L)
    val got = StateBackend.withRocksDB(spark)(
      runTws(events, steps, span, "cep_tws_eq"))
    assert(got.length == got.toSet.size, "exactly once: no duplicates")
    val batch = Patterns.detectBatch(
        events.toDF("key", "ts", "ev_id", "tag"), steps, span)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got.toSet == batch)
    assert(got.nonEmpty)
  }

  test("TWS absence stream == batch absence form over final data (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = deterministicEvents(300, 4, 43L)
    val (a, b, within) = ("view", "purchase", 90000L)
    val got = StateBackend.withRocksDB(spark) {
      val mem = MemoryStream[Ev]
      val out = PatternsTws.detectAbsenceStream(
        mem.toDF().withWatermark("ts", "30 seconds").as[Ev], a, b, within)
      val q = out.writeStream.format("memory").queryName("cep_tws_abs")
        .outputMode("append").start()
      try {
        val sorted = events.sortBy(e => (e.ts.getTime, e.evId))
        for (chunk <- sorted.grouped(60)) { mem.addData(chunk: _*); q.processAllAvailable() }
        val flushTs = sorted.last.ts.getTime + 10 * 60 * 1000L
        mem.addData(ev(99L, flushTs, 100000L, "noop")); q.processAllAvailable()
        mem.addData(ev(99L, flushTs + 120000L, 200000L, "noop")); q.processAllAvailable()
        spark.table("cep_tws_abs").as[Patterns.Absence].collect()
          .map(m => (m.key, m.startTs.getTime, m.startId)).toSeq
      } finally q.stop()
    }
    assert(got.length == got.toSet.size, "exactly once")
    val batch = Patterns.detectAbsenceBatch(
        events.toDF("key", "ts", "ev_id", "tag"), a, b, within)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .toSet
    assert(got.toSet == batch)
    assert(got.nonEmpty)
  }

  test("TWS duplicate delivery and beyond-watermark events are handled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateBackend.withRocksDB(spark) {
      val mem = MemoryStream[Ev]
      val out = PatternsTws.detectStream(
        mem.toDF().withWatermark("ts", "10 seconds").as[Ev], Seq("a", "b"), 60000L)
      val q = out.writeStream.format("memory").queryName("cep_tws_dup")
        .outputMode("append").start()
      try {
        mem.addData(ev(1, 100000, 1, "a"), ev(1, 110000, 2, "b"))
        q.processAllAvailable()
        mem.addData(ev(1, 110000, 2, "b")) // duplicate delivery → no-op
        q.processAllAvailable()
        mem.addData(ev(1, 500000, 9, "x")) // advances watermark far past 110s
        q.processAllAvailable()
        mem.addData(ev(1, 50000, 3, "a")) // beyond watermark → dropped
        mem.addData(ev(1, 900000, 10, "x")) // finalize everything
        q.processAllAvailable()
        val got = spark.table("cep_tws_dup").as[PatMatch].collect()
        assert(got.map(m => (m.key, m.startId)).toSeq == Seq((1L, 1L)))
      } finally q.stop()
    }
  }

  test("TWS requires the RocksDB provider (default provider rejected)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = PatternsTws.detectStream(
      mem.toDF().withWatermark("ts", "10 seconds").as[Ev], Seq("a", "b"), 60000L)
    // pin the composition requirement: without StateBackend.withRocksDB the
    // query must FAIL (multi-column-family state), not silently degrade
    val err = intercept[Exception] {
      val q = out.writeStream.format("memory").queryName("cep_tws_neg")
        .outputMode("append").start()
      try { mem.addData(ev(1, 100000, 1, "a")); q.processAllAvailable() }
      finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m =>
        m.toLowerCase.contains("column famil") ||
        m.toLowerCase.contains("rocksdb") ||
        m.toLowerCase.contains("transformwithstate")),
      s"unexpected failure shape: ${messages(err).headOption}")
  }
}
