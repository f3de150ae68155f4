package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Changelog application: batch apply vs a brute-force mirror, and the
  * incremental fold's confluence — any batching/ordering of the same
  * changelog must converge to the same state, including delete-before-
  * insert arrivals and stragglers below a tombstone's sequence. */
class CdcSpec extends AnyFunSuite with SparkTestBase {

  // (key, seq, op, payload): update chains, plain delete, and a
  // delete-then-reinsert (higher-seq insert after a delete must win)
  private val log: Seq[(Long, Long, String, Option[String])] = Seq(
    (1L, 1L, "I", Some("a1")), (1L, 2L, "U", Some("a2")), (1L, 3L, "U", Some("a3")),
    (2L, 1L, "I", Some("b1")), (2L, 2L, "D", None),
    (3L, 1L, "I", Some("c1")),
    (4L, 1L, "I", Some("d1")), (4L, 2L, "D", None), (4L, 3L, "I", Some("d3")),
    (5L, 7L, "I", Some("e7")), (5L, 2L, "U", Some("e2")) // out-of-order seqs
  )

  private def mirror(rows: Seq[(Long, Long, String, Option[String])]): Map[Long, Option[String]] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val w = rs.maxBy(_._2)
      if (w._3 == "D") None else Some(k -> w._4)
    }

  private def toDf(rows: Seq[(Long, Long, String, Option[String])]) = {
    import spark.implicits._
    rows.toDF("key", "seq", "op", "payload")
  }

  private def collectState(df: org.apache.spark.sql.DataFrame): Map[Long, Option[String]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap

  test("applyLog == brute force: update chains, deletes, delete-then-reinsert") {
    val got = collectState(Cdc.applyLog(toDf(log), "key", "seq", "op", Seq("payload")))
    assert(got == mirror(log))
    assert(!got.contains(2L)) // deleted
    assert(got(4L) == Some("d3")) // reinsert after delete wins
    assert(got(1L) == Some("a3") && got(5L) == Some("e7"))
  }

  test("foldBatch is confluent: seq-ordered, reversed, and scrambled chunkings agree") {
    val expect = mirror(log)
    val orderings = Seq(
      log.sortBy(r => (r._2, r._1)),
      log.sortBy(r => (r._2, r._1)).reverse, // every delete precedes its insert
      log.sortBy(r => ((r._1 * 131 + r._2 * 37) % 11, r._1, r._2)))
    for ((ord, i) <- orderings.zipWithIndex; nChunks <- Seq(1, 3, 5)) {
      var state: org.apache.spark.sql.DataFrame = null
      for (chunk <- ord.grouped(math.max(1, ord.length / nChunks)))
        state = Cdc.foldBatch(state, toDf(chunk), "key", "seq", "op", Seq("payload"))
      val got = collectState(Cdc.stateTable(state, "key", "seq", "op", Seq("payload")))
      assert(got == expect, s"ordering=$i chunks=$nChunks")
    }
  }

  test("diff emits I/U/D exactly where snapshots differ; apply(before ∪ diff) == after") {
    import spark.implicits._
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, Option.empty[String])).toDF("key", "payload")
    val after = Seq((1L, Some("a")), (2L, Some("B")), (5L, Some("e")),
      (4L, Some("d"))).toDF("key", "payload") // 3 deleted, 2 updated, 5 inserted, 4 null→value
    val d = Cdc.diff(before, after, "key", Seq("payload")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    assert(d == Set((2L, "U", Some("B")), (3L, "D", None),
      (5L, "I", Some("e")), (4L, "U", Some("d")))) // unchanged key 1 absent
    // round-trip: before-as-inserts (seq 0) + diff (seq 1) applied == after
    val log = before.select(col("key"), lit(0L).as("seq"), lit("I").as("op"),
        col("payload"))
      .unionByName(Cdc.diff(before, after, "key", Seq("payload"))
        .select(col("key"), lit(1L).as("seq"), col("op"), col("payload")))
    val rt = collectState(Cdc.applyLog(log, "key", "seq", "op", Seq("payload")))
    val want = after.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(rt == want)
  }

  test("straggler below a tombstone's seq cannot resurrect the key") {
    val first = toDf(Seq((9L, 5L, "D", None)))
    val straggler = toDf(Seq((9L, 3L, "U", Some("late"))))
    var state = Cdc.foldBatch(null, first, "key", "seq", "op", Seq("payload"))
    state = Cdc.foldBatch(state, straggler, "key", "seq", "op", Seq("payload"))
    assert(Cdc.stateTable(state, "key", "seq", "op", Seq("payload")).count() == 0)
    // and the tombstone itself is still in the internal state
    assert(collectState(state.select(col("key"), col("payload"))) == Map(9L -> None))
  }
}
