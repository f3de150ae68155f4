package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Count-Min sketch as a Spark-native aggregation.
  *
  * The classic formulation is a d×w counter array; the Spark-first framing
  * is that the array IS a keyed aggregate — a DataFrame of
  * ((row r, bucket b) → count) produced by `groupBy(r, b).sum(w)`. That
  * buys everything the engine already has for free: distributed partial
  * (map-side) aggregation builds per-partition sketches and the shuffle
  * merges them (the sketch is a commutative monoid, and Spark's partial
  * aggregation IS the merge); the STREAMING sketch is the same aggregation
  * under `writeStream` (complete/update mode) with no custom state code;
  * and the table is trivially broadcast for estimate lookups (d·w rows,
  * independent of corpus size).
  *
  * Hash family: h_r(key) = (polyHash(key)·(2r+1) + 17r+3) mod P mod w —
  * the same portable family the MinHash signatures use, so the DuckDB
  * oracle replays the sketch bit-exactly. polyHash < P ≈ 2^20, so all
  * arithmetic stays far from Long overflow.
  *
  * Guarantees (standard CM): estimate(k) ≥ true(k) always, and
  * estimate(k) ≤ true(k) + εN with probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln(1/δ)⌉ (SketchSpec pins the lower bound exactly and the
  * overestimate bound on the fixture). At 100 TB the sketch size is still
  * d·w longs — the whole point.
  */
object CountMin {

  import TextOps.P

  /** Bucket of `keyHash` (a polyHash value) in row r. */
  def bucket(keyHash: Column, r: Column, width: Int): Column =
    ((keyHash * (r * 2 + 1) + (r * 17 + 3)) % P) % width

  /** The sketch table (r, b, cnt) from weighted occurrences — one shuffle
    * of at most d·w distinct groups, partial-aggregated map-side. */
  def sketchTable(occurrences: DataFrame, keyCol: String, wCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame =
    occurrences
      .select(TextOps.polyHash(col(keyCol)).as("h"), col(wCol).as("w"))
      .select(col("h"), col("w"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), bucket(col("h"), col("r"), width).as("b"))
      .agg(sum("w").as("cnt"))

  /** Point estimates for `keys` (column `keyCol`): min over the d rows of
    * the key's bucket counts. The sketch table is tiny and broadcast;
    * absent buckets coalesce to 0 (an uninserted key estimates 0). */
  def estimates(table: DataFrame, keys: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 1024): DataFrame =
    keys.select(col(keyCol).as("k"), TextOps.polyHash(col(keyCol)).as("h"))
      .select(col("k"), col("h"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b", bucket(col("h"), col("r"), width))
      .join(broadcast(table), Seq("r", "b"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Heavy hitters over a token stream of `docs`: sketch every token
    * occurrence, then estimate every distinct token and keep estimates ≥
    * `minEst`. One corpus scan for the sketch, one for the distinct keys —
    * never a per-key exact count at sketch time. */
  def tokenHeavyHitters(docs: DataFrame, textCol: String,
                        depth: Int = 4, width: Int = 1024,
                        minEst: Long = 0L): DataFrame = {
    val occ = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("w", lit(1L))
    val table = sketchTable(occ, "tok", "w", depth, width)
    val keys = occ.select(col("tok")).distinct()
    estimates(table, keys, "tok", depth, width)
      .where(col("est") >= minEst)
      .select(col("k").as("token"), col("est"))
  }
}
