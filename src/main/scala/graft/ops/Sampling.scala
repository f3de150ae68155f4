package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps.P

/** Deterministic sampling for training-data pipelines. `df.sample()` draws
  * from a per-partition RNG — re-running the job, changing the partition
  * count, or recovering a lost partition yields a DIFFERENT sample, which
  * breaks train/eval splits and any reproducibility audit. The pipeline
  * form is a hash gate: a row is kept iff hash(stable key) falls under the
  * rate threshold — membership is a pure function of the key, identical
  * across reruns, engines, partitionings and scales (the same reason the
  * engine keys all streaming state by value, never by arrival:
  * /root/reference/src/index.rs keys its index purely by node id).
  */
object Sampling {

  /** Portable integer hash of a long key into [0, P): MINSTD-style affine
    * map mod the polyHash prime — replayable in one line of SQL. The
    * multiplier must be large relative to P (a small one maps small dense
    * id ranges onto a small prefix of [0, P) and every row lands under any
    * non-tiny rate threshold — a vacuous sample). 48271·(P−1) < 2^46, so
    * ANSI-safe. */
  def keyHash(key: Column): Column = (pmod(key.cast("long"), lit(P)) * 48271 + 7) % P

  /** Keep rows whose key hashes under `rate` (0..1): hash < floor(rate·P).
    * The same key is kept at rate r1 whenever it is kept at any r2 < r1 —
    * nested samples come free (eval ⊂ train holdouts). */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    df.where(keyHash(col(keyCol)) < math.floor(rate * P).toLong)
  }

  /** Weighted hash sample: per-row inclusion probability proportional to
    * an INTEGER weight column (e.g. a token count or quality score), capped
    * at 1 — keep iff hash(key) < min(P, weight·perUnit). Everything stays
    * in exact integer arithmetic, so membership is a pure function of
    * (key, weight) — replayable in one line of SQL, invariant under rerun /
    * repartition / scale, and still nested (a row kept at perUnit p1 is
    * kept at every p2 > p1). One codegen'd filter stage, no shuffle. */
  def weightedHashSample(df: DataFrame, keyCol: String, weightCol: String,
                         perUnit: Long): DataFrame = {
    require(perUnit >= 0, "perUnit must be non-negative")
    if (perUnit == 0) return df.where(lit(false))
    // never form weight·perUnit for weights at/above the cap: the product
    // can wrap a long (dropping rows the cap says to KEEP, while the SQL
    // oracle would raise instead — divergence either way). weight ≥
    // ceil(P/perUnit) ⟺ weight·perUnit ≥ P ⟺ keep-all; below the cap the
    // product is < P + perUnit and exact.
    val capW = (P + perUnit - 1) / perUnit
    val w = col(weightCol).cast("long")
    // the product branch only ever sees 0 < w < capW, where w·perUnit is
    // < P + perUnit — exact; negative weights (which could also wrap the
    // product) drop outright, matching inclusion probability 0
    df.where(w >= capW || (w > 0 && keyHash(col(keyCol)) < w * perUnit))
  }

  /** EXACT-SIZE deterministic sample: the k rows with the smallest key
    * hashes, hash ties broken by key (keys that collide mod P are rare but
    * real). Complements rate sampling — a hash gate can't promise a size,
    * bottom-k can't promise a fixed rate — while keeping the properties
    * that matter: rerun/partition-invariant, and nested (bottom-3 is a
    * prefix of bottom-5, so a small eval set sits inside the train draw).
    * Plans as TakeOrderedAndProject — parallel per-partition top-k, never
    * a global sort. */
  def bottomK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 0, "k must be non-negative")
    df.withColumn("_h", keyHash(col(keyCol)))
      .orderBy(col("_h").asc, col(keyCol).asc).limit(k)
      .drop("_h")
  }

  /** Stratified hash sample: per-stratum rates (e.g. downsample the head
    * language, keep the tail), default rate for unlisted strata. Rates ride
    * a broadcast join — at 100 TB the fact side streams through one
    * codegen'd filter stage, no shuffle. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq
      .map { case (s, r) => (s, math.floor(r * P).toLong) }
      .toDF(strataCol, "_thresh")
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("_thresh",
        coalesce(col("_thresh"), lit(math.floor(defaultRate * P).toLong)))
      .where(keyHash(col(keyCol)) < col("_thresh"))
      .drop("_thresh")
  }

  /** Token-budget data mixing: per group (source/domain/language), keep the
    * hash-ordered prefix of documents whose cumulative token count first
    * reaches the group's budget — the "mix 30B tokens of code, 10B of
    * forums" primitive of every pre-training data recipe. A document is
    * kept iff the tokens BEFORE it (in (keyHash, key) order) are strictly
    * under budget, so the budget-crossing document is kept and budgets are
    * soft caps; membership is a pure function of the group's key set, so
    * reruns, repartitions and engine swaps agree row-for-row.
    *
    * Semantically this is `sum(tokens) OVER (PARTITION BY group ORDER BY
    * hash, key) - tokens < budget` — but a per-group running sum is a
    * sequential scan of the whole group, and at 100 TB a "group" is a
    * source with billions of rows funneled through one window partition.
    * So it runs as two phases that meet the same contract exactly:
    *   1. histogram: groupBy(group, hash-bucket).sum(tokens) — fully
    *      parallel, `groups × buckets` rows to the driver; the driver
    *      walks each group's buckets in hash order and finds the single
    *      budget-crossing bucket plus the tokens consumed before it.
    *   2. filter: buckets below the crossing bucket are kept outright by a
    *      broadcast-joined codegen'd filter (no shuffle, no order); ONLY
    *      the crossing bucket — ~1/buckets of each group — pays the
    *      ordered running-sum window, against its residual budget.
    * Bucketing is monotone in the hash, and the within-bucket order equals
    * the global order, so phase 2 reproduces the naive window bit-for-bit
    * (SamplingSpec pins the equality).
    *
    * Contract: `keyCol` and `groupCol` must be NON-NULL (they are ids and
    * partition labels). A null key has no hash order position (the driver
    * histogram decode rejects it); a null group cannot meet the crossing
    * table on an equi-join and would bypass its budget — pre-bucket nulls
    * into a real group value (`coalesce(group, "(none)")`) if they must be
    * budgeted. */
  def tokenBudgetMix(df: DataFrame, keyCol: String, groupCol: String,
                     tokensCol: String, budget: String => Long,
                     buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bWidth = P / buckets + 1 // ceil: hash < P ⇒ bucket < buckets
    val withB = df
      .withColumn("_h", keyHash(col(keyCol)))
      .withColumn("_b", (col("_h") / bWidth).cast("int"))
    val hist = withB.groupBy(col(groupCol), col("_b"))
      .agg(sum(col(tokensCol).cast("long")).as("_t"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"tokenBudgetMix: $keyCol and $groupCol must be non-null")
        (r.getString(0), r.getInt(1), if (r.isNullAt(2)) 0L else r.getLong(2))
      }
    // per group: crossing bucket + tokens consumed strictly before it
    val cross: Map[String, (Int, Long)] = hist.groupBy(_._1).map {
      case (g, bs) =>
        val bud = budget(g)
        var pre = 0L
        var cb = Int.MaxValue // budget never reached → every bucket "below"
        val it = bs.sortBy(_._2).iterator
        while (cb == Int.MaxValue && it.hasNext) {
          val (_, b, t) = it.next()
          if (pre + t >= bud) cb = b else pre += t
        }
        g -> (cb, bud - pre) // residual budget inside the crossing bucket
    }
    val crossDf = broadcast(cross.toSeq.map { case (g, (cb, res)) => (g, cb, res) }
      .toDF(groupCol, "_cb", "_res"))
    val joined = withB.join(crossDf, Seq(groupCol), "left")
      .withColumn("_cb", coalesce(col("_cb"), lit(Int.MaxValue)))
    val below = joined.where(col("_b") < col("_cb"))
    // the crossing bucket: ordered running sum against the residual budget
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_h").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atCross = joined.where(col("_b") === col("_cb"))
      .withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .where(col("_cum") - col(tokensCol).cast("long") < col("_res"))
      .drop("_cum")
    below.unionByName(atCross).drop("_h", "_b", "_cb", "_res")
  }

  /** Exact integer square root (single ±1 correction of the double sqrt —
    * exact for n < 2^52, which a per-source token total stays under long
    * past 10^15 tokens/source). */
  private def isqrt(n: Long): Long = {
    require(n >= 0 && n < (1L << 52), s"isqrt domain: 0 <= $n < 2^52")
    val s0 = math.sqrt(n.toDouble).toLong
    if (s0 * s0 > n) s0 - 1
    else if ((s0 + 1) * (s0 + 1) <= n) s0 + 1
    else s0
  }

  /** TEMPERATURE-reweighted source mixing — the tokens^α multi-source
    * rebalancing (α = 1/2, i.e. the p^(1/τ) convention at τ = 2) every
    * multilingual / multi-source pre-training recipe applies so small
    * sources are upsampled relative to their raw share: source s with
    * token total T_s gets target share ∝ √T_s, so its keep rate is
    * ρ_s = min(1, targetTokens·√T_s / (Σ_r √T_r · T_s)) and a document is
    * kept iff hash(key) < floor(ρ_s·P) — the same nested, rerun/partition/
    * scale-invariant hash gate as [[hashSample]].
    *
    * Everything is exact integer arithmetic: √ is the exact [[isqrt]] and
    * the threshold is computed in BigInt (no 64-bit overflow for any
    * target/corpus size), replayed by the SQL oracle in HUGEINT. The
    * per-source stats are ONE |sources|-row aggregate collected to the
    * driver (sources are a partition label — bounded, the same contract as
    * [[tokenBudgetMix]]'s histogram), and the gate itself is a
    * broadcast-joined codegen'd filter: no shuffle touches the corpus.
    * Contract: `groupCol` non-null (pre-bucket nulls as in
    * [[tokenBudgetMix]]); token totals must be positive per source. */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     tokensCol: String, targetTokens: Long): DataFrame = {
    val rates = broadcast(
      temperatureRates(df, groupCol, tokensCol, targetTokens))
    df.join(rates, Seq(groupCol))
      .where(keyHash(col(keyCol)) < col("_thr"))
      .select(df.columns.map(col): _*) // equi-join reorders; restore caller order
  }

  /** The FROZEN rate table behind [[temperatureMix]]: one row per source,
    * (groupCol, _thr) with _thr = floor(ρ_s·P) as above. Exposed so an
    * ingest-time stream can apply batch-trained mixing rates as a
    * stream-static broadcast join — the same frozen-artifact shape as the
    * bigram-LM dict and the BPE merge list. */
  def temperatureRates(df: DataFrame, groupCol: String, tokensCol: String,
                       targetTokens: Long): DataFrame = {
    require(targetTokens >= 0, "targetTokens must be non-negative")
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"temperatureMix: $groupCol must be a string source label, got " +
        df.schema(groupCol).dataType.simpleString)
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol).cast("long")).as("_t"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0), s"temperatureMix: $groupCol must be non-null")
        val t = if (r.isNullAt(1)) 0L else r.getLong(1)
        require(t > 0, s"temperatureMix: source ${r.get(0)} has no tokens")
        (r.getString(0), t)
      }
    val wsum = stats.iterator.map { case (_, t) => BigInt(isqrt(t)) }.sum
    val thr = stats.map { case (g, t) =>
      val num = BigInt(targetTokens) * isqrt(t) * P
      val den = wsum * t
      (g, (num / den).min(BigInt(P)).toLong)
    }
    thr.toSeq.toDF(groupCol, "_thr")
  }
}
