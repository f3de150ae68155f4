package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HDR-histogram-style quantile sketch — the rank companion to
  * [[HyperLogLog]] (cardinality) and [[CountMin]] (frequency): a training
  * pipeline asks "p50/p90/p99 document length" at sizes where an exact
  * quantile is a full sort of the corpus.
  *
  * Spark-first framing, same as the other sketches: the histogram IS a
  * keyed aggregate — `groupBy(bucket).count()` — so per-partition partial
  * aggregation builds per-partition sketches and the one shuffle merges
  * them (bucket-wise count sum is the merge, a commutative monoid). The
  * whole sketch is O(64·2^k) rows regardless of input size, so every pass
  * AFTER the bucketing aggregate runs on sketch-sized data.
  *
  * Portable arithmetic (bit-replayable in the DuckDB oracle): NO float
  * log anywhere — the bucket index uses the classic HDR decomposition of
  * a non-negative integer v with e = floor(log2 v) computed as
  * `length(bin(v)) - 1` (pure string-of-bits length, identical in Spark
  * and DuckDB):
  *   v < 2^k          → bucket = v              (exact linear region)
  *   otherwise        → bucket = (e-k)·2^k + (v >> (e-k))
  * Buckets are contiguous and monotone in v; the bucket containing v has
  * width 2^(e-k), so the relative error of its lower bound is ≤ 2^-k.
  */
object QuantileSketch {

  /** Bucket index of a non-negative integer value (see object doc).
    * Values ≤ 0 land in bucket 0. */
  def bucketOf(v: Column, k: Int): Column = {
    require(k >= 1 && k <= 20, s"sub-bucket bits k=$k must be in [1, 20]")
    val vl = v.cast("long")
    val e = (length(bin(vl)) - lit(1)).cast("long")
    when(vl <= 0L, lit(0L))
      .when(e <= k, vl)
      .otherwise((e - k) * (1L << k) +
        call_function("shiftright", vl, (e - k).cast("int")))
  }

  /** Inverse: the smallest value mapping into `bucket` — the sketch's
    * quantile estimate (an underestimate by at most a factor 1 + 2^-k). */
  def lowerBound(bucket: Column, k: Int): Column = {
    val br = shiftright(bucket, k)
    when(br <= 0L, bucket)
      .otherwise(call_function("shiftleft",
        bucket - (br - 1L) * (1L << k), (br - 1L).cast("int")))
  }

  /** The mergeable sketch: (bucket, cnt). One shuffle, map-side partial
    * aggregation; merging two sketches is a bucket-wise count sum. */
  def sketch(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.groupBy(bucketOf(col(valueCol), k).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Keyed sketch: one mergeable histogram per key tuple (e.g. per
    * event-time window). Same single-shuffle shape as [[sketch]]. */
  def sketchKeyed(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Int): DataFrame =
    df.groupBy(keyCols.map(col) :+ bucketOf(col(valueCol), k).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-key quantiles from a keyed sketch — the identical selection rule
    * as [[quantiles]], but the cumulative window is PARTITIONED by the key
    * columns, so the finalizer is fully parallel (no single-partition
    * exchange anywhere) and its per-key input is one sketch, O(64·2^k)
    * rows. This is the form a per-window latency-quantile dashboard runs
    * at cluster scale. */
  def quantilesPerKey(sk: DataFrame, keyCols: Seq[String], k: Int,
                      permilles: Seq[Int]): DataFrame = {
    require(keyCols.nonEmpty, "use quantiles() for the unkeyed form")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles $permilles must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val kc = keyCols.map(col)
    val wc = Window.partitionBy(kc: _*).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(kc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = sk.withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", sum("cnt").over(wn))
    val spark = sk.sparkSession
    import spark.implicits._
    val qdf = permilles.map(_.toLong).toDF("q_permille")
    cum.crossJoin(broadcast(qdf))
      .where(expr("cum >= ((q_permille * n + 999) DIV 1000)"))
      .groupBy(kc :+ col("q_permille"): _*).agg(min("bucket").as("bucket"))
      .select(kc ++ Seq(col("q_permille"), col("bucket"),
        lowerBound(col("bucket"), k).as("est")): _*)
  }

  /** EXACT quantiles in two corpus passes, sketch-pruned — the scale
    * answer when an estimate is not enough but a full corpus sort is
    * unaffordable. Pass 1 builds the sketch and collects it to the driver:
    * legitimate because the bucket space is HARD-bounded at
    * (63-k)·2^k + 2^(k+1) rows by construction (spec-pinned), independent
    * of corpus size. The driver turns each permille's rank target into
    * (bucket, offset-within-bucket). Pass 2 re-scans the corpus pruned to
    * the ≤ |permilles| selected buckets (the bucket predicate is a plain
    * comparison on a derived column — everything else is filtered out
    * map-side before any shuffle) and rank-selects within each bucket.
    * The only per-bucket funnel is bounded by one bucket's row count —
    * one 2^-k relative band of the distribution; raise k to narrow it.
    * Output: (q_permille, val) — exact order statistics. */
  def exactQuantiles(df: DataFrame, valueCol: String, k: Int,
                     permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles $permilles must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val hist = sketch(df, valueCol, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    if (n == 0L)
      return Seq.empty[(Long, Long)].toDF("q_permille", "val")
    val cumBefore = hist.scanLeft(0L)(_ + _._2) // cum count before hist(i)
    val targets = permilles.map { q =>
      val rank = (q.toLong * n + 999L) / 1000L
      val i = hist.indices.find(i => rank <= cumBefore(i) + hist(i)._2).get
      (q.toLong, hist(i)._1, rank - cumBefore(i))
    }
    val tdf = targets.toDF("q_permille", "tb", "toff")
    val ranked = df.select(col(valueCol).cast("long").as("val"))
      .withColumn("b", bucketOf(col("val"), k))
      .join(broadcast(tdf.select(col("tb").as("b")).distinct()), "b")
      .withColumn("rn",
        row_number().over(Window.partitionBy("b").orderBy("val")).cast("long"))
    ranked.join(broadcast(tdf),
        ranked("b") === tdf("tb") && ranked("rn") === tdf("toff"))
      .select(col("q_permille"), col("val"))
  }

  /** Quantile estimates at the requested permilles from a sketch.
    * Output: (q_permille, bucket, est). The rank target is
    * ceil(q·n/1000); the chosen bucket is the first whose cumulative
    * count reaches it. The ordering window and the permille join below
    * run on SKETCH-sized data (O(64·2^k) rows by construction), never on
    * the corpus — the single-partition exchange they plan is bounded by
    * the sketch, exactly like the other sketch finalizers here. */
  def quantiles(sk: DataFrame, k: Int, permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles $permilles must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val wc = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = sk.withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", sum("cnt").over(wn))
    val spark = sk.sparkSession
    import spark.implicits._
    val qdf = permilles.map(_.toLong).toDF("q_permille")
    qdf.join(cum, expr("cum >= ((q_permille * n + 999) DIV 1000)"))
      .groupBy("q_permille").agg(min("bucket").as("bucket"))
      .select(col("q_permille"), col("bucket"),
        lowerBound(col("bucket"), k).as("est"))
  }
}
