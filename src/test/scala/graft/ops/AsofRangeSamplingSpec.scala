package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** As-of join, binned range join, deterministic sampling: each against a
  * brute-force reference on adversarial fixtures (ties, boundaries, hot
  * intervals, partitioning changes). */
class AsofRangeSamplingSpec extends AnyFunSuite with SparkTestBase {

  // ---------------- as-of ----------------

  private def asofRef(left: Seq[(Long, Long, Long)],
                      right: Seq[(Long, Long, Long, Double)]) =
    // left (id, key, ts); right (id, key, ts, v): latest right with
    // ts_r <= ts_l, largest id on ties
    left.map { case (id, k, t) =>
      val cand = right.filter(r => r._2 == k && r._3 <= t)
      val best =
        if (cand.isEmpty) None
        else Some(cand.maxBy(r => (r._3, r._1)))
      (id, best.map(_._1), best.map(_._4))
    }.toSet

  test("asof backward == brute force, incl. equal-ts ties and no-predecessor") {
    import spark.implicits._
    val leftRows = Seq(
      (100L, 1L, 50L), (101L, 1L, 10L), (102L, 1L, 5L),
      (103L, 2L, 50L), (104L, 3L, 7L))
    val rightRows = Seq(
      (1L, 1L, 10L, 1.0),  // ties a left row's ts exactly → visible to it
      (2L, 1L, 10L, 2.0),  // same (key, ts): larger id wins
      (3L, 1L, 40L, 3.0),
      (4L, 2L, 60L, 4.0))  // after the only key-2 left row → unused
    val l = leftRows.toDF("event_id", "k", "ts")
    val r = rightRows.toDF("event_id", "k", "ts", "v")
    val got = AsofJoin.backward(l, r, key = "k", ts = "ts",
        tieBreak = "event_id", payload = Seq("event_id", "v"))
      .collect().map(x => (x.getLong(0),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got == asofRef(leftRows, rightRows))
  }

  test("asof payload struct keeps columns row-consistent under null payload values") {
    import spark.implicits._
    val l = Seq((10L, 1L, 100L)).toDF("event_id", "k", "ts")
    // newest right row carries a NULL v — the output must pair that row's
    // id with ITS null, not reach back to the older row's non-null v
    val r = Seq((1L, 1L, 10L, Some(5.0)), (2L, 1L, 20L, None))
      .toDF("event_id", "k", "ts", "v")
    val row = AsofJoin.backward(l, r, "k", "ts", "event_id", Seq("event_id", "v")).head()
    assert(row.getLong(3) == 2L && row.isNullAt(4))
  }

  // ---------------- range join ----------------

  test("binned range join == inequality join, incl. hot intervals and boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val points = (0 until 400).map(i => (i.toLong, rnd.nextInt(10000).toLong))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(9500).toLong
      (1000L + i, s, s + 1 + rnd.nextInt(300))
    } ++ Seq(
      (2000L, 0L, 10000L),   // corpus-spanning: forces the broadcast hot path
      (2001L, 500L, 500L),   // empty interval → matches nothing
      (2002L, 100L, 101L))   // width 1: only pt == 100
    val p = points.toDF("pid", "pt")
    val iv = ivs.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, "pt", iv, "s", "e",
        binWidth = 128L, hotSpanBins = 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, pt) <- points; (iid, s, e) <- ivs if pt >= s && pt < e
    } yield (pid, iid)).toSet
    assert(got == want)
    // the spanning interval must have matched every point (proves the hot
    // path actually contributes rows)
    assert(got.count(_._2 == 2000L) == points.size)
  }

  // ---------------- sampling ----------------

  test("hash sample: deterministic, partition-invariant, nested by rate") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    def ids(rate: Double, parts: Int) =
      Sampling.hashSample(df.repartition(parts), "id", rate)
        .collect().map(_.getLong(0)).toSet
    val s10 = ids(0.1, 4)
    assert(s10 == ids(0.1, 13))          // partitioning never changes membership
    assert(s10.subsetOf(ids(0.3, 4)))    // nested samples
    assert(math.abs(s10.size - 200) < 60) // rate is honored (loose bound)
    assert(ids(0.0, 4).isEmpty && ids(1.0, 4).size == 2000)
  }

  test("weighted sample: membership == scalar rule, monotone in weight and perUnit") {
    import spark.implicits._
    val p = graft.text.TextOps.P
    // weights 0..120 so the min(P, w·perUnit) cap binds for w ≥ 101
    val df = (0L until 2000L).map(i => (i, i % 121)).toDF("id", "w")
    def ids(perUnit: Long, parts: Int) =
      Sampling.weightedHashSample(df.repartition(parts), "id", "w", perUnit)
        .collect().map(_.getLong(0)).toSet
    val s = ids(10000L, 4)
    assert(s == ids(10000L, 13)) // partition-invariant
    assert(s.subsetOf(ids(20000L, 4))) // nested in the higher rate
    // per-row membership equals the scalar rule, cap included
    (0L until 2000L).foreach { i =>
      val thresh = math.min(p, (i % 121) * 10000L)
      assert(s.contains(i) == ((i % p * 48271 + 7) % p < thresh), s"id=$i")
    }
    // weight 0 is never kept; a capped weight keeps everything its hash allows
    assert(!s.exists(_ % 121 == 0))
    // overflow regression: a weight whose product with perUnit would wrap a
    // long must land in the keep-all cap branch, never the product; negative
    // weights drop (inclusion probability 0 — and their product could also
    // wrap positive)
    val extremes = Seq((1L, Long.MaxValue / 2), (2L, 0L), (3L, Long.MinValue))
      .toDF("id", "w")
    assert(Sampling.weightedHashSample(extremes, "id", "w", 10000L)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("bottom-k sample: exact size, nested across k, partition-invariant, top-k plan") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    def ids(k: Int, parts: Int) =
      Sampling.bottomK(df.repartition(parts), "id", k)
        .collect().map(_.getLong(0)).toSet
    val s5 = ids(5, 4)
    assert(s5.size == 5)
    assert(s5 == ids(5, 13))           // partitioning never changes the draw
    assert(s5.subsetOf(ids(25, 4)))    // bottom-5 is a prefix of bottom-25
    // the limit-after-sort must plan as a distributed top-k
    val plan = Sampling.bottomK(df, "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("stratified sample applies per-stratum and default rates") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedHashSample(df, "id", "lang",
      rates = Map("en" -> 0.1), defaultRate = 0.9)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 100) < 40)
    assert(math.abs(byLang("de") - 1800) < 120)
    // per-row membership equals the scalar rule
    val keep = got.select("id").collect().map(_.getLong(0)).toSet
    val p = graft.text.TextOps.P
    (0L until 3000L).foreach { i =>
      val thresh = if (i % 3 == 0) math.floor(0.1 * p) else math.floor(0.9 * p)
      assert(keep.contains(i) == ((i % p * 48271 + 7) % p < thresh))
    }
  }

  test("token-budget mix: two-phase == naive running-sum window, budgets are soft caps") {
    import spark.implicits._
    val p = graft.text.TextOps.P
    // 3 groups × 400 docs, token counts 1..40
    val rows = for (g <- 0 until 3; i <- 0 until 400) yield
      (g * 1000L + i, s"src$g", (i % 40 + 1).toLong)
    val df = rows.toDF("id", "src", "nt").repartition(7)
    val budget: String => Long =
      Map("src0" -> 500L, "src1" -> 100000L, "src2" -> 0L) // cross / never / nothing
    // naive reference: per-group hash-ordered prefix sum
    def hash(i: Long) = (i % p * 48271 + 7) % p
    val expect = rows.groupBy(_._2).flatMap { case (g, rs) =>
      var cum = 0L
      rs.sortBy(r => (hash(r._1), r._1)).takeWhile { r =>
        val keep = cum < budget(g); cum += r._3; keep
      }
    }.map(_._1).toSet
    for (buckets <- Seq(1, 8, 1024)) { // 1 = pure window; 1024 = pure histogram path
      val got = Sampling.tokenBudgetMix(df, "id", "src", "nt", budget, buckets)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"buckets=$buckets")
    }
    // soft cap: src0's kept tokens reach the budget and stop at the
    // crossing doc; src1 keeps everything; src2 keeps nothing
    val kept = rows.filter(r => expect(r._1))
    val t0 = kept.filter(_._2 == "src0").map(_._3).sum
    assert(t0 >= 500L && t0 < 500L + 40L)
    assert(kept.count(_._2 == "src1") == 400 && !kept.exists(_._2 == "src2"))
  }

  test("temperature mix: sqrt reweighting caps small sources, thins big ones") {
    import spark.implicits._
    val p = graft.text.TextOps.P
    // big source: 900 docs × 100 tokens; small: 20 docs × 100 tokens
    val rows = (for (i <- 0 until 900) yield (i.toLong, "big", 100L)) ++
      (for (i <- 0 until 20) yield (2000L + i, "small", 100L))
    val df = rows.toDF("id", "src", "nt").repartition(7)
    val got = Sampling.temperatureMix(df, "id", "src", "nt",
      targetTokens = 30000L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // exact scalar replay: w = isqrt(T), thr = floor(N·w·P/(Σw·T)) capped
    def isq(n: Long) = { val s = math.sqrt(n.toDouble).toLong
      if (s * s > n) s - 1 else if ((s + 1) * (s + 1) <= n) s + 1 else s }
    val tBig = 90000L; val tSmall = 2000L
    val wsum = BigInt(isq(tBig)) + BigInt(isq(tSmall))
    def thr(t: Long) =
      (BigInt(30000L) * isq(t) * p / (wsum * t)).min(BigInt(p)).toLong
    assert(thr(tSmall) == p, "small source must hit the keep-all cap")
    assert(thr(tBig) < p, "big source must be thinned")
    def hash(i: Long) = (i % p * 48271 + 7) % p
    val expect = rows.filter { case (id, s, _) =>
      hash(id) < thr(if (s == "big") tBig else tSmall)
    }.map(t => (t._1, t._2)).toSet
    assert(got == expect)
    assert(got.count(_._2 == "small") == 20)
    val nBig = got.count(_._2 == "big")
    assert(nBig > 0 && nBig < 900)
  }

  test("temperature mix is partitioning-invariant and nested in the target") {
    import spark.implicits._
    val rows = (for (i <- 0 until 300) yield (i.toLong, s"s${i % 4}", (i % 50 + 1).toLong))
    def run(parts: Int, n: Long) =
      Sampling.temperatureMix(rows.toDF("id", "src", "nt").repartition(parts),
        "id", "src", "nt", targetTokens = n)
        .collect().map(_.getLong(0)).toSet
    assert(run(1, 4000L) == run(11, 4000L))
    // hash gates nest: every doc kept at a smaller target survives a larger
    assert(run(5, 2000L).subsetOf(run(5, 6000L)))
  }
}
