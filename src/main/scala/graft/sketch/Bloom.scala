package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Bloom filter for semi-join pruning — the 100 TB pattern: a fact table
  * is pruned by a COMPACT filter over the qualifying dimension keys
  * instead of shuffling the fact side or broadcasting a giant IN-list.
  *
  * Scale discipline:
  *  - the build collects only the DISTINCT SET BIT POSITIONS — at most
  *    `mBits` rows regardless of how many keys were inserted (a 10^9-key
  *    dimension still collects ≤ m integers);
  *  - the filter itself is an `array<boolean>` LITERAL inside the plan, so
  *    membership is a pure whole-stage-codegen expression evaluated in the
  *    fact table's scan stage — no join, no shuffle, no UDF;
  *  - pruning is an OPTIMIZATION, never semantics: `semiJoin` verifies the
  *    survivors with an exact (broadcast) join, so false positives are
  *    dropped and the result equals the plain semi-join (oracle-checked).
  *
  * Hash family: probe_i(key) = ((key mod P)·(2i+1) + 17i+3) mod P mod m —
  * the portable affine family the other sketches use, so DuckDB replays
  * the exact bit pattern INCLUDING the false positives
  * (`bloom_membership` pins them). */
object Bloom {

  import TextOps.P

  /** Same affine family as [[CountMin.bucket]] (one definition, mirrored
    * by the oracle SQL), over the key reduced mod P. */
  def probe(key: Column, i: Int, mBits: Int): Column =
    CountMin.bucket(pmod(key.cast("long"), lit(P)), lit(i), mBits)

  /** Distinct set-bit positions of the filter over `keys` — the collected
    * result is bounded by mBits, not by the key count. NULL keys are
    * skipped (semi-join semantics: NULL never matches, so it must not set
    * bits — and must not NPE the build). */
  def buildPositions(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Int] =
    keys.where(col(keyCol).isNotNull)
      .select(explode(array(
        (0 until k).map(i => probe(col(keyCol), i, mBits)): _*)).as("p"))
      .distinct().collect().map(_.getLong(0).toInt).sorted

  /** The filter as an array<boolean> literal (codegen-resident). */
  def bitsLit(positions: Array[Int], mBits: Int): Column = {
    val b = new Array[Boolean](mBits)
    positions.foreach(b(_) = true)
    array(b.map(lit).toIndexedSeq: _*)
  }

  /** Membership test: all k probed bits set. Pure codegen'd functions. */
  def mightContain(bits: Column, key: Column, mBits: Int, k: Int): Column =
    (0 until k)
      .map(i => element_at(bits, (probe(key, i, mBits) + 1).cast("int")))
      .reduce(_ && _)

  /** Exact semi-join of `fact` against `dimKeys` with a bloom pre-filter:
    * the fact scan keeps only rows whose key might be in the filter (the
    * vast majority of non-qualifying rows never leave the scan stage),
    * then a broadcast join against the true key set drops the false
    * positives. Output is EXACTLY the plain semi-join. */
  def semiJoin(fact: DataFrame, factKeyCol: String,
               dimKeys: DataFrame, dimKeyCol: String,
               mBits: Int = 1 << 14, k: Int = 3): DataFrame = {
    val bits = bitsLit(buildPositions(dimKeys, dimKeyCol, mBits, k), mBits)
    // a NULL fact key probes to NULL → filter drops it, matching the
    // semi-join's NULL-never-matches rule
    val pruned = fact.where(mightContain(bits, col(factKeyCol), mBits, k))
    // dataframe-qualified join refs: no rename, so a fact column that
    // happens to share any name cannot become an ambiguous reference
    val dimDistinct = dimKeys.select(col(dimKeyCol)).distinct()
    pruned.join(broadcast(dimDistinct),
      pruned(factKeyCol) === dimDistinct(dimKeyCol), "leftsemi")
  }

  /** Filter size that keeps the false-positive rate ~3% at ANY corpus
    * scale: m = 8·n bits for n inserted keys (k=3: (1−e^(−3/8))³ ≈ 0.03).
    * A FIXED m silently saturates once n grows past it — measured: 2048
    * bits over sf0.1's 6945 qualifying keys set every bit, making
    * membership vacuously true and the prune a no-op. */
  def sizeFor(nKeys: Long): Int = math.max(64L, 8L * nKeys).toInt
}
