package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.Patterns.{Ev, PatMatch}

/** CEP sequence detection: the streaming fMGWS form over shuffled/late
  * input must equal the batch lead()-chain form over the final data, every
  * occurrence exactly once; a Scala mirror pins both. */
class PatternsSpec extends AnyFunSuite with SparkTestBase {

  private def ev(key: Long, tsMs: Long, id: Long, tag: String) =
    Ev(key, new Timestamp(tsMs), id, tag)

  /** Brute-force mirror of the contiguous-steps semantics. */
  private def mirror(events: Seq[Ev], steps: Seq[String],
                     maxSpanMs: Long): Set[(Long, Long, Long, Long)] =
    events.groupBy(_.key).flatMap { case (k, es) =>
      val ord = es.sortBy(e => (e.ts.getTime, e.evId)).toIndexedSeq
      (0 to ord.length - steps.size).flatMap { i =>
        val run = ord.slice(i, i + steps.size)
        if (run.map(_.tag) == steps &&
            run.last.ts.getTime - run.head.ts.getTime <= maxSpanMs)
          Some((k, run.head.ts.getTime, run.last.ts.getTime, run.head.evId))
        else None
      }
    }.toSet

  private def deterministicEvents(n: Int, keys: Int, seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val tags = Vector("view", "click", "purchase", "error")
    (0 until n).map { i =>
      ev(rnd.nextInt(keys).toLong, 100000L + rnd.nextInt(600) * 1000L, i.toLong,
        tags(rnd.nextInt(tags.size)))
    }
  }

  test("batch form == brute-force mirror (2- and 3-step patterns)") {
    import spark.implicits._
    val events = deterministicEvents(400, 5, 31L)
    val df = events.toDF("key", "ts", "ev_id", "tag")
    for (steps <- Seq(Seq("view", "click"), Seq("view", "click", "purchase"))) {
      val got = Patterns.detectBatch(df, steps, maxSpanMs = 120000L).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3))).toSet
      assert(got == mirror(events, steps, 120000L), s"steps=$steps")
      assert(got.nonEmpty, s"vacuous fixture for $steps")
    }
  }

  test("stream over shuffled input == batch over final data, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click")
    val span = 60000L
    val events = deterministicEvents(300, 4, 37L)
    val mem = MemoryStream[Ev]
    val out = Patterns.detectStream(
      mem.toDF().withWatermark("ts", "30 seconds").as[Ev], steps, span)
    val q = out.writeStream.format("memory").queryName("cep_test")
      .outputMode("append").start()
    try {
      // deliver in ts-shuffled chunks whose internal disorder stays inside
      // the 30s watermark delay, then a far-future flush event per key so
      // every window finalizes
      val sorted = events.sortBy(e => (e.ts.getTime, e.evId))
      val shuffler = new scala.util.Random(7)
      for (chunk <- sorted.grouped(60)) {
        mem.addData(shuffler.shuffle(chunk.toList): _*)
        q.processAllAvailable()
      }
      // advance the watermark with events on an UNRELATED key only: the
      // real keys are quiescent, so their finalized matches must flow out
      // of the event-time-timeout path, not piggyback on new data
      val flushTs = sorted.last.ts.getTime + 10 * 60 * 1000L
      mem.addData(ev(99L, flushTs, 100000L, "noop"))
      q.processAllAvailable()
      mem.addData(ev(99L, flushTs + 120000L, 200000L, "noop"))
      q.processAllAvailable()

      val got = spark.table("cep_test").as[PatMatch].collect()
        .map(m => (m.key, m.startTs.getTime, m.endTs.getTime, m.startId))
      // exactly once: no duplicates
      assert(got.length == got.toSet.size)
      assert(got.toSet == mirror(events, steps, span))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  private def absenceMirror(events: Seq[Ev], a: String, b: String,
                            withinMs: Long): Set[(Long, Long, Long)] =
    events.groupBy(_.key).flatMap { case (k, es) =>
      val ord = es.sortBy(e => (e.ts.getTime, e.evId)).toIndexedSeq
      ord.indices.flatMap { i =>
        if (ord(i).tag != a) None
        else {
          val deadline = ord(i).ts.getTime + withinMs
          val followed = (i + 1 until ord.length).exists(j =>
            ord(j).tag == b && ord(j).ts.getTime <= deadline)
          if (followed) None else Some((k, ord(i).ts.getTime, ord(i).evId))
        }
      }
    }.toSet

  test("absence batch form == brute-force mirror") {
    import spark.implicits._
    val events = deterministicEvents(400, 5, 41L)
    val df = events.toDF("key", "ts", "ev_id", "tag")
    val got = Patterns.detectAbsenceBatch(df, "view", "purchase", withinMs = 90000L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    val expect = absenceMirror(events, "view", "purchase", 90000L)
    assert(got == expect)
    assert(expect.nonEmpty)
    // the deadline matters: unbounded absence is a strict subset
    val unbounded = Patterns.detectAbsenceBatch(df, "view", "purchase",
      withinMs = 365L * 24 * 3600 * 1000).collect()
    assert(unbounded.length < expect.size)
  }

  test("absence stream over shuffled input == batch, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val withinMs = 60000L
    val events = deterministicEvents(300, 4, 43L)
    val mem = MemoryStream[Ev]
    val out = Patterns.detectAbsenceStream(
      mem.toDF().withWatermark("ts", "30 seconds").as[Ev],
      "view", "purchase", withinMs)
    val q = out.writeStream.format("memory").queryName("cep_abs")
      .outputMode("append").start()
    try {
      val shuffler = new scala.util.Random(9)
      val sorted = events.sortBy(e => (e.ts.getTime, e.evId))
      for (chunk <- sorted.grouped(60)) {
        mem.addData(shuffler.shuffle(chunk.toList): _*)
        q.processAllAvailable()
      }
      // unrelated-key watermark advancement: quiescent keys emit their
      // finalized absences via the event-time timeout
      val flushTs = sorted.last.ts.getTime + 10 * 60 * 1000L
      mem.addData(ev(99L, flushTs, 100000L, "noop"))
      q.processAllAvailable()
      mem.addData(ev(99L, flushTs + 300000L, 200000L, "noop"))
      q.processAllAvailable()
      val got = spark.table("cep_abs").as[Patterns.Absence].collect()
        .map(m => (m.key, m.startTs.getTime, m.startId))
      assert(got.length == got.toSet.size)
      assert(got.toSet == absenceMirror(events, "view", "purchase", withinMs))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("duplicate delivery and beyond-watermark events are handled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("a", "b")
    val mem = MemoryStream[Ev]
    val out = Patterns.detectStream(
      mem.toDF().withWatermark("ts", "10 seconds").as[Ev], steps, 60000L)
    val q = out.writeStream.format("memory").queryName("cep_dup")
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
      val got = spark.table("cep_dup").as[PatMatch].collect()
      assert(got.map(m => (m.key, m.startId)).toSeq == Seq((1L, 1L)))
    } finally q.stop()
  }
}
