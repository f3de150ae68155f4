package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the HDR-style quantile sketch: bucket/inverse consistency over a
  * dense value range, rank correctness of the quantile selection against
  * an exact sort, exactness in the linear region, and sketch mergeability. */
class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val k = 5

  test("bucketOf is monotone; lowerBound is the bucket's floor within 2^-k") {
    val vs = (0L to 5000L) ++ Seq(10000L, 123456L, 999999L, 1L << 40)
    val rows = vs.toDF("v")
      .select(col("v"), QuantileSketch.bucketOf(col("v"), k).as("b"))
      .withColumn("lb", QuantileSketch.lowerBound(col("b"), k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (v, b, lb) =>
      assert(lb <= v, s"lowerBound $lb above value $v (bucket $b)")
      // bucket width is 2^(e-k) ≤ max(lb >> k, 1): the relative-error bound
      assert(v - lb <= math.max(lb >> k, 1L), s"v=$v lb=$lb overshoots width")
      if (v < (1L << (k + 1))) assert(lb == v, s"linear region must be exact: $v")
    }
    val byV = rows.sortBy(_._1)
    byV.zip(byV.tail).foreach { case ((v1, b1, _), (v2, b2, _)) =>
      assert(b1 <= b2, s"non-monotone: v$v1→b$b1 but v$v2→b$b2")
    }
  }

  test("quantile selection picks the bucket of the exactly-ranked value") {
    val vals = (0 until 4000).map(i =>
      math.abs(graft.gen.TranscriptGen.splitmix64(77L + i)) % 1000000L)
    val sk = QuantileSketch.sketch(vals.toDF("val"), "val", k)
    val got = QuantileSketch.quantiles(sk, k, Seq(500, 900, 990))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sorted = vals.sorted
    for (q <- Seq(500L, 900L, 990L)) {
      val target = ((q * vals.size + 999) / 1000).toInt // ceil rank, 1-indexed
      val exact = sorted(target - 1)
      val (bucket, est) = got(q)
      val exactBucket = QuantileSketch.bucketOf(lit(exact), k)
      val eb = Seq(0L).toDF("z").select(exactBucket.as("b")).head().getLong(0)
      assert(bucket == eb, s"q=$q chose bucket $bucket, exact value sits in $eb")
      assert(est <= exact && exact - est <= math.max(est >> k, 1L),
        s"q=$q est $est vs exact $exact outside the 2^-k band")
    }
  }

  test("linear-region corpus yields exact quantiles") {
    val vals = (1L to 31L) ++ (1L to 31L) ++ Seq(0L)
    val sk = QuantileSketch.sketch(vals.toDF("val"), "val", k)
    val got = QuantileSketch.quantiles(sk, k, Seq(500, 990))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = vals.sorted
    for (q <- Seq(500L, 990L)) {
      val exact = sorted((((q * vals.size + 999) / 1000) - 1).toInt)
      assert(got(q) == exact, s"q=$q: linear region must be exact")
    }
  }

  test("bucket space is hard-bounded: the finalizer's input is sketch-sized") {
    // the audit-triage claim behind the finalizer's single-partition
    // window: NO input can produce more than (63-k)·2^k + 2^(k+1) buckets
    val adversarial = (0 until 63).flatMap { e =>
      val lo = 1L << e
      Seq(lo, lo + (lo >> 1), (lo << 1) - 1).filter(_ > 0)
    } ++ (0L to 64L)
    val n = QuantileSketch.sketch(adversarial.toDF("val"), "val", k)
      .count()
    assert(n <= (63 - k).toLong * (1L << k) + (1L << (k + 1)),
      s"sketch grew to $n buckets")
  }

  test("keyed form equals the unkeyed finalizer run per key") {
    val rows = (0 until 3000).map { i =>
      val key = i % 7
      val v = math.abs(graft.gen.TranscriptGen.splitmix64(991L + i)) % 500000L
      (key.toLong, v)
    }
    val df = rows.toDF("key", "val")
    val got = QuantileSketch.quantilesPerKey(
      QuantileSketch.sketchKeyed(df, Seq("key"), "val", k),
      Seq("key"), k, Seq(500, 900, 990))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet.map(_._1) == (0L until 7L).toSet)
    for (key <- 0L until 7L) {
      val vs = rows.filter(_._1 == key).map(_._2)
      val expect = QuantileSketch.quantiles(
        QuantileSketch.sketch(vs.toDF("val"), "val", k), k, Seq(500, 900, 990))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      for (q <- Seq(500L, 900L, 990L))
        assert(got((key, q)) == expect(q), s"key=$key q=$q diverged from unkeyed")
    }
  }

  test("keyed finalizer plans no single-partition exchange") {
    val df = (0 until 200).map(i => (i % 5L, (i * 37L) % 9999L))
      .toDF("key", "val")
    val plan = QuantileSketch.quantilesPerKey(
      QuantileSketch.sketchKeyed(df, Seq("key"), "val", k),
      Seq("key"), k, Seq(500, 990))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "the keyed cumulative window must stay partitioned by the key")
  }

  test("exactQuantiles returns the exact order statistic at every permille") {
    val vals = (0 until 5000).map(i =>
      math.abs(graft.gen.TranscriptGen.splitmix64(13L + i)) % 2000000L) ++
      Seq.fill(40)(7L) // heavy tie block crossing a rank boundary
    val df = vals.toDF("val")
    val permilles = Seq(1, 250, 500, 900, 990, 1000)
    val got = QuantileSketch.exactQuantiles(df, "val", k, permilles)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    for (q <- permilles) {
      val rank = (q.toLong * vals.size + 999L) / 1000L
      assert(got(q.toLong) == sorted(rank.toInt - 1),
        s"q=$q expected exact ${sorted(rank.toInt - 1)}, got ${got(q.toLong)}")
    }
  }

  test("exactQuantiles on empty input is empty; pass 2 prunes to target buckets") {
    assert(QuantileSketch.exactQuantiles(
      Seq.empty[Long].toDF("val"), "val", k, Seq(500)).isEmpty)
    // the second pass must touch only the selected buckets: every surviving
    // row's bucket is one of the ≤|permilles| targets
    val vals = (0 until 3000).map(i => (i * 17L) % 400000L)
    val out = QuantileSketch.exactQuantiles(vals.toDF("val"), "val", k, Seq(500, 990))
    assert(out.count() == 2)
  }

  test("sketches merge by bucket-wise count sum") {
    val a = (0 until 500).map(i => math.abs(graft.gen.TranscriptGen.splitmix64(i.toLong)) % 100000L)
    val b = (500 until 900).map(i => math.abs(graft.gen.TranscriptGen.splitmix64(i.toLong)) % 100000L)
    def counts(vs: Seq[Long]) =
      QuantileSketch.sketch(vs.toDF("val"), "val", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = counts(a ++ b)
    val merged = (counts(a).toSeq ++ counts(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(whole == merged)
  }
}
