package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.dedup.Dedup
import graft.text.TextOps

/** Chunking, span-level dedup stats, JSON prop extraction, and LOCF
  * resampling — boundary fixtures plus brute-force references. */
class PipelineOpsSpec extends AnyFunSuite with SparkTestBase {

  // ---------------- doc_chunks ----------------

  /** Reference chunker: starts 0, stride, … < n; window truncated at end. */
  private def chunkRef(text: String, win: Int, stride: Int): Seq[(Long, Long, String)] = {
    val t = text.trim match { case "" => Array.empty[String]; case s => s.split("\\s+") }
    (0 until t.length by stride).zipWithIndex.map { case (s0, i) =>
      val c = t.slice(s0, s0 + win)
      (i.toLong, c.length.toLong, c.mkString(" "))
    }
  }

  test("chunks == brute force on boundary shapes") {
    import spark.implicits._
    val fixtures = Seq(
      "",                                   // empty → no chunks
      "a",                                  // shorter than win
      (1 to 32).map(i => s"w$i").mkString(" "),  // exactly one window
      (1 to 33).map(i => s"w$i").mkString(" "),  // one token past → 2 chunks
      (1 to 24).map(i => s"w$i").mkString(" "),  // exactly one stride
      (1 to 25).map(i => s"w$i").mkString(" "),  // stride + 1
      (1 to 100).map(i => s"w$i").mkString(" "), // several overlapping
      "  padded   whitespace  text  ")
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        explode(TextOps.chunks(col("text"), 32, 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_chunk_tokens"),
        col("c.chunk_text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = fixtures.zipWithIndex.flatMap { case (t, i) =>
      chunkRef(t, 32, 24).map { case (ci, nt, ct) => (i.toLong, ci, nt, ct) }
    }.toSet
    assert(got === want)
    assert(want.exists(_._2 >= 3), "fixture must produce multi-chunk docs")
  }

  test("chunk overlap: consecutive windows share win-stride tokens") {
    import spark.implicits._
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val rows = Seq((0L, text)).toDF("doc_id", "text")
      .select(explode(TextOps.chunks(col("text"), 32, 24)).as("c"))
      .select(col("c.chunk_idx"), col("c.chunk_text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq)).sortBy(_._1)
    assert(rows.length === 3)
    // chunk k starts at 24k: last 8 tokens of chunk 0 = first 8 of chunk 1
    assert(rows(0)._2.takeRight(8) === rows(1)._2.take(8))
  }

  // ---------------- span_dup_stats ----------------

  test("spanDupStats: planted shared passage flags exactly the sharers") {
    import spark.implicits._
    // docs 0 and 1 share an 8-token passage; 2 is unique; 3 is too short
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      (0L, s"a1 a2 $shared"),
      (1L, s"b1 $shared b2"),
      (2L, (1 to 12).map(i => s"u$i").mkString(" ")),
      (3L, "t1 t2 t3")).toDF("doc_id", "text")
    val got = Dedup.spanDupStats(df, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // doc0: 10 tokens → 3 spans, 1 dup (the aligned shared one)
    assert(got(0L) === ((3L, 1L)))
    assert(got(1L) === ((3L, 1L)))
    assert(got(2L) === ((5L, 0L)))
    assert(got(3L) === ((0L, 0L)))
  }

  test("spanDupStats: intra-doc repeat alone is NOT cross-doc duplication") {
    import spark.implicits._
    val rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    val df = Seq(
      (0L, s"$rep $rep"),                  // repeats only within itself
      (1L, (1 to 20).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.spanDupStats(df, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(0L) === 0L)
    // …but once doc 1 also carries the passage, EVERY position counts,
    // including both of doc 0's
    val df2 = Seq((0L, s"$rep $rep"), (1L, s"x1 $rep")).toDF("doc_id", "text")
    val got2 = Dedup.spanDupStats(df2, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got2(0L) >= 2L)
  }

  // ---------------- json_extract_props ----------------

  test("get_json_object extraction degrades to NULL on malformed/missing/non-integer") {
    import spark.implicits._
    // the gate's exact expression: try_cast, so a non-integer k degrades
    // instead of throwing under ANSI
    val df = Seq(
      (0L, """{"k": 42}"""),
      (1L, """{"j": 1}"""),       // key absent
      (2L, "not json"),            // malformed
      (3L, null.asInstanceOf[String]),
      (4L, """{"k": "abc"}"""),   // non-numeric k
      (5L, """{"k": 1.5}"""))     // non-integer k
      .toDF("event_id", "props")
      .select(col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
    val got = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(0L -> Some(42L), 1L -> None, 2L -> None, 3L -> None,
      4L -> None, 5L -> None))
  }

  // ---------------- resample_ffill ----------------

  test("LOCF resample == brute force, incl. tie and single-hour user") {
    import spark.implicits._
    def ts(m: Long) = new Timestamp(m)
    val H = 3600L * 1000
    // user 1: events across 3 hours, two at the SAME ts (larger id wins);
    // user 2: all inside one hour → no grid rows at all
    val events = Seq(
      (10L, 1L, ts(10 * 60000), 1.0),
      (11L, 1L, ts(10 * 60000), 2.0),        // tie: id 11 wins
      (12L, 1L, ts(H + 30 * 60000), 3.0),
      (13L, 1L, ts(3 * H + 1), 4.0),
      (20L, 2L, ts(5 * 60000), 9.0),
      (21L, 2L, ts(6 * 60000), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val hour = expr("INTERVAL 1 HOUR")
    val grid = events.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      .where(col("lo") + hour <= col("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo") + hour, col("hi"), hour)).as("ts"),
        lit(0L).as("event_id"))
    val got = AsofJoin.backward(grid,
        events.select("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", payload = Seq("value"))
      .select(col("user_id"), col("ts"), col("asof_value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .toSet
    // user 1 grid: hours 1..3 (trunc(min)=0 → start 1h; trunc(max)=3h)
    val want = Set(
      (1L, H, 2.0),          // hour 1: tie resolved to id 11
      (1L, 2 * H, 3.0),
      (1L, 3 * H, 3.0))      // id 13 is 1ms AFTER the hour-3 grid point
    assert(got === want)
    assert(!got.exists(_._1 == 2L), "single-hour user must produce no grid")
  }
}
