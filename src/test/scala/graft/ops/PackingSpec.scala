package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Sequence packing + epoch shuffle: brute-force equality, window-vs-scan
  * plan equivalence, and the packing invariants. */
class PackingSpec extends AnyFunSuite with SparkTestBase {

  /** Brute-force packer over (doc_id, ntok) in doc_id order. */
  private def packRef(nt: Seq[(Long, Long)], b: Long): Set[(Long, Long, Long, Long)] = {
    var start = 0L
    nt.sortBy(_._1).flatMap { case (id, n) =>
      val s0 = start; start += n
      if (n == 0) Seq.empty
      else (s0 / b to (s0 + n - 1) / b).map { p =>
        val lo = math.max(p * b, s0); val hi = math.min((p + 1) * b, s0 + n)
        (id, p, hi - lo, lo - p * b)
      }
    }.toSet
  }

  private val fixture = Seq(
    (0L, "a b c"),                                  // 3 tokens
    (1L, ""),                                       // empty → vanishes
    (2L, (1 to 10).map(i => s"t$i").mkString(" ")), // spans the 8-boundary
    (3L, (1 to 8).map(i => s"u$i").mkString(" ")),  // exactly one budget
    (4L, (1 to 21).map(i => s"v$i").mkString(" ")), // spans 3+ packs
    (5L, "z"))

  test("packSequences == brute force (budget 8), incl. boundary shapes") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val nt = fixture.map { case (id, t) =>
      (id, t.trim.split("\\s+").count(_.nonEmpty).toLong) }
    val got = Packing.packSequences(df, "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = packRef(nt, 8)
    assert(got === want)
    assert(want.exists(_._2 >= 3), "fixture must span 4+ packs")
    assert(want.count(_._1 == 4L) >= 3, "doc 4 must straddle 3 packs")
  }

  test("packing invariants: full packs, per-doc token conservation") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val perPack = out.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val lastPack = perPack.keys.max
    perPack.foreach { case (p, tot) =>
      if (p != lastPack) assert(tot === 8L, s"pack $p must be full") }
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(perDoc(2L) === 10L && perDoc(4L) === 21L)
    assert(!perDoc.contains(1L), "empty doc contributes nothing")
  }

  test("prefix-sum window and scan paths emit identical rows") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "ntok")
    def run(maxRows: Long) =
      Packing.prefixSumByOrder(df, Seq(col("doc_id").asc), "ntok", "start",
          windowMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(Long.MaxValue) === run(0L)) // 0 forces the distributed scan
  }

  test("prefix-sum accepts a non-Long integral weight on BOTH paths") {
    import spark.implicits._
    // an IntegerType weight: the window path widens silently, so the scan
    // path must normalize rather than ClassCastException at 10^7+ rows
    val df = (0L until 50L).map(i => (i, (i % 5 + 1).toInt)).toDF("doc_id", "w")
    def run(maxRows: Long) =
      Packing.prefixSumByOrder(df, Seq(col("doc_id").asc), "w", "start",
          windowMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(Long.MaxValue) === run(0L))
  }

  test("packSequences identical across the plan switch") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    def run(maxRows: Long) =
      Packing.packSequences(df, "doc_id", "text", budget = 8, windowMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(Long.MaxValue) === run(0L))
  }

  test("shuffled packing == brute force over the seeded permutation order") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val nt = fixture.map { case (id, t) =>
      (id, t.trim.split("\\s+").count(_.nonEmpty).toLong) }.filter(_._2 > 0)
    val a = Packing.shuffleMultiplier(1L)
    def h(id: Long) = Math.floorMod(id * a + 54321L, 2147483647L)
    // brute force: cumulate in (hash, id) order, then slice into packs
    var start = 0L
    val want = nt.sortBy { case (id, _) => (h(id), id) }.flatMap { case (id, n) =>
      val s0 = start; start += n
      (s0 / 8 to (s0 + n - 1) / 8).map { p =>
        val lo = math.max(p * 8, s0); val hi = math.min((p + 1) * 8, s0 + n)
        (id, p, hi - lo, lo - p * 8)
      }
    }.toSet
    val got = Packing.packSequences(df, "doc_id", "text", budget = 8,
        shuffleSeed = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    // the composition genuinely reorders: some doc's pack assignment
    // differs from the doc_id-ordered packing
    val plain = Packing.packSequences(df, "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got !== plain, "seeded order must change the packing")
  }

  test("scan-path plans carry no single-partition exchange") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "ntok")
    val scanPlan = Packing.prefixSumByOrder(df, Seq(col("doc_id").asc), "ntok",
        "start", windowMaxRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!scanPlan.contains("Exchange SinglePartition"),
      "large-input prefix sum must not funnel through one partition")
    // and the small path DOES use the window (the switch is real)
    val winPlan = Packing.prefixSumByOrder(df, Seq(col("doc_id").asc), "ntok",
        "start", windowMaxRows = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(winPlan.contains("Window"), "small path should plan a window")
  }

  test("epochShuffle: a permutation, seed-sensitive, path-invariant") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def run(seed: Long, maxRows: Long) =
      Packing.epochShuffle(df, "doc_id", seed, windowMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val s1 = run(1L, Long.MaxValue)
    assert(s1.map(_._2).sorted === (0L until 50L).toSeq, "positions are 0..n-1")
    assert(s1.exists { case (id, pos) => id != pos }, "not the identity")
    assert(s1 !== run(2L, Long.MaxValue), "seed changes the order")
    assert(s1 === run(1L, 0L), "window and scan paths agree")
  }

  test("packMasked: mask round-trips, segments agree with packSequences, paths agree") {
    import spark.implicits._
    // prompts/completions with boundary shapes: completion straddling a
    // pack boundary, prompt-only segment, completion-only segment
    val ex = Seq(
      (10L, "p1 p2 p3", "c1 c2"),             // 3+2
      (11L, "q1 q2 q3 q4 q5 q6", "d1"),       // 6+1 — crosses the 8-line
      (12L, "", "e1 e2 e3"),                  // empty prompt: all loss
      (13L, "r1 r2", ""),                     // empty completion: no loss
      // start 17, prompt ends at abs 36, completion spans 36..41 — across
      // the pack-4/pack-5 line at 40
      (14L, (1 to 19).map(i => s"s$i").mkString(" "), "f1 f2 f3 f4 f5 f6"))
    val df = ex.toDF("ex_id", "prompt", "completion")
    def run(maxRows: Long) =
      Packing.packMasked(df, "ex_id", "prompt", "completion", budget = 8,
          windowMaxRows = maxRows).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = run(Long.MaxValue)
    assert(got.toSet == run(0L).toSet, "window and scan paths agree")
    // segment geometry identical to the unmasked packer on concatenated text
    val nt = ex.map { case (id, p, c) =>
      def n(s: String) = if (s.trim.isEmpty) 0L else s.trim.split("\\s+").length.toLong
      (id, n(p) + n(c)) }
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == packRef(nt, 8L))
    // mask conservation: per example, Σ loss = completion tokens,
    // Σ pack - Σ loss = prompt tokens
    val loss = got.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val tot = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    ex.foreach { case (id, p, c) =>
      def n(s: String) = if (s.trim.isEmpty) 0L else s.trim.split("\\s+").length.toLong
      assert(loss(id) == n(c), s"ex $id loss tokens")
      assert(tot(id) - loss(id) == n(p), s"ex $id masked tokens")
    }
    // a straddling completion splits its loss across packs
    assert(got.count(t => t._1 == 14L && t._5 > 0) > 1,
      "example 14's completion must contribute loss to more than one pack")
    // per-segment sanity: 0 <= loss <= pack_tokens
    got.foreach(t => assert(t._5 >= 0 && t._5 <= t._3))
  }
}
