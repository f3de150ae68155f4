package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.text.TextOps

/** Sequence packing — the step a training pipeline runs LAST, after
  * cleaning/dedup/mixing: concatenate documents in a deterministic total
  * order into one token stream and split it into fixed-size context windows
  * ("packs") of `budget` tokens. A document whose tokens straddle a pack
  * boundary contributes a segment to each pack it overlaps, which is
  * exactly what GPT-style concat-and-chunk dataloaders feed the model.
  *
  * The only non-embarrassingly-parallel piece is the exclusive prefix sum
  * of token counts over the global order. [[prefixSumByOrder]] computes it
  * with the same SIZE-GATED plan decision as
  * [[graft.sources.Layout.denseRankByOrder]] (which is the weight≡1
  * special case): a single window while the input is small, and past the
  * threshold the classic two-pass distributed scan — range-partition +
  * in-partition sort, one tiny per-partition-total collect (O(#partitions)
  * driver rows, never O(rows)), then a per-partition local scan seeded by
  * the broadcast offsets. Identical output on both paths (PackingSpec pins
  * it), no single-task global sort at 10^9 docs.
  */
object Packing {

  /** Appends `outCol` = sum of `weightCol` over all STRICTLY PRECEDING rows
    * in the given total order (exclusive prefix sum; first row gets 0).
    * Ties must be broken by the order itself. Small inputs: one running
    * window. Large inputs: two-pass distributed scan (see object doc). The
    * input is localCheckpoint'ed: the sizing count and both paths reuse one
    * materialization. */
  def prefixSumByOrder(df: DataFrame, order: Seq[Column], weightCol: String,
                       outCol: String,
                       windowMaxRows: Long = graft.sources.Layout.defaultWindowMaxRows): DataFrame = {
    // weight normalized to LongType up front: both paths then emit the
    // same schema, and the scan path's getLong cannot hit a narrower
    // integral type that the window path would have silently widened
    val d = df.withColumn(weightCol, col(weightCol).cast(LongType)).localCheckpoint()
    if (d.count() <= windowMaxRows) {
      val w = Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      d.withColumn(outCol, coalesce(sum(col(weightCol)).over(w), lit(0L)))
    } else {
      val spark = d.sparkSession
      val parts = spark.sessionState.conf.numShufflePartitions
      val sorted = d.repartitionByRange(parts, order: _*)
        .sortWithinPartitions(order: _*)
      val wIdx = sorted.schema.fieldIndex(weightCol)
      val rdd = sorted.rdd
      rdd.persist()
      try {
        // pass 1: per-partition totals — O(#partitions) rows to the driver
        val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
          var s = 0L; it.foreach(r => s += r.getLong(wIdx)); Iterator((pid, s))
        }.collect().sortBy(_._1).map(_._2)
        val offsets = totals.scanLeft(0L)(_ + _) // exclusive: offsets(pid)
        val bc = spark.sparkContext.broadcast(offsets)
        // pass 2: local scan seeded by the partition's global offset
        val schema = sorted.schema.add(outCol, LongType)
        val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
          var acc = bc.value(pid)
          it.map { r =>
            val out = Row.fromSeq(r.toSeq :+ acc); acc += r.getLong(wIdx); out
          }
        }
        // materialize before unpersisting (the finally below): the result
        // re-reads `rdd` once, and the cached sorted copy must not outlive
        // this call (the rest of the codebase pairs persist with unpersist)
        spark.createDataFrame(rows, schema).localCheckpoint()
      } finally rdd.unpersist(blocking = false)
    }
  }

  /** Packs documents (concatenated in ascending `idCol` order, tokenized by
    * [[TextOps.tokens]]) into fixed windows of `budget` tokens. Output: one
    * row per (document, pack) overlap —
    * (doc_id, pack_id, pack_tokens, offset_in_pack) where `pack_tokens` is
    * how many of the doc's tokens land in that pack and `offset_in_pack` is
    * where its segment starts inside the pack. Empty docs vanish (they
    * contribute no tokens); Σ pack_tokens per doc = the doc's token count;
    * every pack except the last is exactly `budget` full.
    *
    * Scale shape: the prefix sum above, then a narrow per-row explode over
    * the 1 + (span ÷ budget) packs the doc touches — no further shuffle.
    * Integer arithmetic only (DIV/LEAST/GREATEST on longs), so the driver
    * oracle replays it exactly. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int,
                    windowMaxRows: Long = graft.sources.Layout.defaultWindowMaxRows,
                    shuffleSeed: Option[Long] = None): DataFrame = {
    require(budget > 0, s"pack budget $budget must be positive")
    val ntPlain = docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).as("ntok"))
      .where(col("ntok") > 0)
    // shuffleSeed composes the epoch shuffle INTO the pack: the
    // concatenation order becomes the seeded permutation (what a real
    // dataloader feeds the model), same [[shuffleMultiplier]] hash as
    // [[epochShuffle]] so the two gates share one definition
    val (nt, order) = shuffleSeed match {
      case None => (ntPlain, Seq(col("doc_id").asc))
      case Some(seed) =>
        (ntPlain.withColumn("_h",
          pmod(col("doc_id") * lit(shuffleMultiplier(seed)) + lit(54321L),
            lit(2147483647L))),
          Seq(col("_h").asc, col("doc_id").asc))
    }
    val started = prefixSumByOrder(nt, order, "ntok", "start", windowMaxRows)
      .drop("_h")
    val b = lit(budget.toLong)
    val firstPack = expr(s"start DIV ${budget}L")
    val lastPack = expr(s"(start + ntok - 1) DIV ${budget}L")
    started
      .select(col("doc_id"), col("start"), col("ntok"),
        explode(sequence(firstPack, lastPack)).as("pack_id"))
      .select(col("doc_id"), col("pack_id"),
        (least((col("pack_id") + 1) * b, col("start") + col("ntok"))
          - greatest(col("pack_id") * b, col("start"))).as("pack_tokens"),
        (greatest(col("pack_id") * b, col("start"))
          - col("pack_id") * b).as("offset_in_pack"))
  }

  /** LOSS-MASKED packing of SFT examples — the step between pair
    * extraction and the dataloader: examples (prompt + completion) are
    * concatenated in ascending `idCol` order and split into fixed windows
    * of `budget` tokens exactly like [[packSequences]], but each segment
    * additionally reports how many of its tokens are LOSS tokens
    * (completion positions — the only ones SFT trains on; prompt positions
    * are masked). Output: one row per (example, pack) overlap —
    * (ex_id, pack_id, pack_tokens, offset_in_pack, loss_tokens) with
    * 0 ≤ loss_tokens ≤ pack_tokens; Σ loss_tokens per example = its
    * completion token count, so the mask is exactly reconstructible.
    *
    * Same scale shape as [[packSequences]]: the size-gated prefix sum,
    * then a narrow per-row explode — integer arithmetic only (the mask
    * boundary is just `start + prompt_tokens`), replayed exactly by the
    * SQL oracle. */
  def packMasked(examples: DataFrame, idCol: String, promptCol: String,
                 completionCol: String, budget: Int,
                 windowMaxRows: Long = graft.sources.Layout.defaultWindowMaxRows): DataFrame = {
    require(budget > 0, s"pack budget $budget must be positive")
    val nt = examples
      .select(col(idCol).as("ex_id"),
        TextOps.tokenCount(col(promptCol)).as("npr"),
        TextOps.tokenCount(col(completionCol)).as("nco"))
      .withColumn("ntok", col("npr") + col("nco"))
      .where(col("ntok") > 0)
    val started = prefixSumByOrder(nt, Seq(col("ex_id").asc), "ntok", "start",
      windowMaxRows)
    val b = lit(budget.toLong)
    val segStart = greatest(col("pack_id") * b, col("start"))
    val segEnd = least((col("pack_id") + 1) * b, col("start") + col("ntok"))
    started
      .select(col("ex_id"), col("start"), col("npr"), col("ntok"),
        explode(sequence(expr(s"start DIV ${budget}L"),
          expr(s"(start + ntok - 1) DIV ${budget}L"))).as("pack_id"))
      .select(col("ex_id"), col("pack_id"),
        (segEnd - segStart).as("pack_tokens"),
        (segStart - col("pack_id") * b).as("offset_in_pack"),
        greatest(lit(0L),
          segEnd - greatest(segStart, col("start") + col("npr"))).as("loss_tokens"))
  }

  /** Multiplier for [[epochShuffle]]'s hash, derived from the seed. The
    * seed must pick the MULTIPLIER, not an additive constant: adding a
    * per-seed constant mod M only rotates the hash circle, which preserves
    * almost every pairwise order — two "different" epochs would replay
    * nearly the same permutation (PackingSpec's seed-sensitivity arm caught
    * exactly that in the first draft). M = 2^31−1 is prime, so any nonzero
    * multiplier is invertible and the map id→id·a is a bijection. */
  def shuffleMultiplier(seed: Long): Long = {
    val a = math.floorMod(1103515245L + seed * 2654435761L, 2147483647L)
    if (a == 0L) 1L else a
  }

  /** Deterministic epoch shuffle — the data-order randomization between
    * mixing and packing: a seeded pseudorandom permutation of documents,
    * positions 0..n-1. The hash is (id·a(seed) + 54321) mod 2^31−1 with
    * [[shuffleMultiplier]] reduced mod M, so the product stays
    * overflow-free in 64-bit arithmetic for id < 2^32 and the oracle
    * replays it verbatim; a production run would swap in xxhash64(id, seed)
    * — same one-expression shape, same rank kernel. Ranking rides
    * [[graft.sources.Layout.denseRankByOrder]], so past 10^7 docs the
    * permutation is a range-partitioned sort, never a one-task window. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   windowMaxRows: Long = graft.sources.Layout.defaultWindowMaxRows): DataFrame = {
    val keyed = docs.select(col(idCol).as("doc_id"))
      .select(col("doc_id"),
        pmod(col("doc_id") * lit(shuffleMultiplier(seed)) + lit(54321L),
          lit(2147483647L)).as("h"))
    graft.sources.Layout.denseRankByOrder(keyed,
        Seq(col("h").asc, col("doc_id").asc), "shuffle_pos", base = 0L,
        windowMaxRows = windowMaxRows)
      .select(col("doc_id"), col("shuffle_pos"))
  }
}
