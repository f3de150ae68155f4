package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** HyperLogLog distinct-count sketch as a Spark-native aggregation — the
  * cardinality companion to [[CountMin]] (frequency): a training-data
  * pipeline asks "how many distinct documents / URLs / shingles" at sizes
  * where exact `count(distinct)` is a full shuffle of every key.
  *
  * Spark-first framing, same as CountMin: the register array IS a keyed
  * aggregate — `groupBy(bucket).agg(max(rho))` — so per-partition partial
  * aggregation builds per-partition sketches and the shuffle merges them
  * (register-wise max is the HLL merge, a commutative monoid), the
  * streaming form is the same aggregation under complete/update mode, and
  * the whole sketch is m rows regardless of input size.
  *
  * Portable arithmetic (bit-replayable in the DuckDB oracle): with
  * h = polyHash(key) < P ≈ 2^20 and large-multiplier affine maps
  * g0 = (h·48271 + 3) mod P, g1 = (h·16807 + 17) mod P —
  *   bucket = ⌊g0·m / P⌋ (the high RANGE of g0, never its low bits),
  *   rho    = (trailing zeros of g1) + 1, capped at 21 (g1 = 0), computed
  *            as `count{ k in 1..20 : g1 mod 2^k = 0 } + 1` — pure integer
  *            arithmetic, no float log anywhere.
  * Why this family and not CountMin's small-multiplier g_r: polyHash values
  * of short keys cluster in narrow ranges, and for any two affine maps that
  * don't wrap, keys agreeing mod m also agree on their image's low bits —
  * so a low-bit bucket fixes rho ≤ log2(m) and max-merge degenerates to a
  * single observation (measured: est saturated at ~67 for n=1000, m=32).
  * Large odd multipliers equidistribute clustered h across [0,P), and
  * taking the bucket from g0's range keeps its bits disjoint from the
  * trailing-zero bits of g1.
  * Estimates use the standard bias-corrected harmonic mean with the
  * small-range linear-counting correction; every 2^-register term is an
  * exact double, so the only cross-engine rounding is the final division
  * (and ln() in the small-range branch), absorbed by round(est, 6).
  */
object HyperLogLog {

  import TextOps.P

  private val MaxRho = 21

  /** alpha_m constants from Flajolet et al. 2007. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  private def g0(h: Column): Column = (h * 48271L + 3L) % P
  private def g1(h: Column): Column = (h * 16807L + 17L) % P

  /** Register index of a polyHash value: ⌊g0·m / P⌋. Exact integer
    * division without a `div` operator: g0·m − (g0·m mod P) is a multiple
    * of P bounded by 2^25, so the double division is exact. */
  def bucket(h: Column, m: Int): Column = {
    val gm = g0(h) * m
    ((gm - gm % P) / P).cast("long")
  }

  /** rho = trailing-zero count of g1 plus one (capped): counted with pure
    * integer divisibility so both engines agree bit-for-bit. */
  def rho(h: Column): Column = {
    val v = g1(h)
    val powers = array((1 until MaxRho).map(k => lit(1L << k)): _*)
    size(filter(powers, p => v % p === 0)) + lit(1)
  }

  /** The register table (bucket, rho) — one shuffle of at most m groups,
    * partial-aggregated map-side. Buckets never hit are absent (treated as
    * register 0 by [[estimate]]). */
  def registers(keys: DataFrame, keyCol: String, m: Int = 32): DataFrame =
    keys.select(TextOps.polyHash(col(keyCol)).as("h"))
      .groupBy(bucket(col("h"), m).cast("long").as("bucket"))
      .agg(max(rho(col("h"))).cast("long").as("rho"))

  /** Exact 2^-rho terms as literal doubles (1/2^k is an exact binary
    * fraction; a libm pow() is NOT guaranteed exact cross-engine). */
  def invPow2(maxRho: Int = MaxRho): Seq[Double] =
    (1 to maxRho).map(k => 1.0 / (1L << k))

  /** Cardinality estimate from a register table: bias-corrected harmonic
    * mean, with linear counting below 2.5m when empty registers remain.
    * Returns one row (est double). */
  def estimate(registers: DataFrame, m: Int = 32): DataFrame = {
    val inv = array(invPow2().map(lit): _*)
    val agg = registers.agg(
      sum(element_at(inv, col("rho").cast("int"))).as("s"),
      count(lit(1)).as("filled"))
    agg.select(
      (lit(alpha(m)) * m * m / (col("s") + (lit(m) - col("filled")))).as("raw"),
      (lit(m) - col("filled")).cast("double").as("zeros"))
      .select(round(
        when(col("raw") <= 2.5 * m && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")), 6).as("est"))
  }

  /** Per-key cardinality estimates from a KEYED register table
    * (keyCols..., bucket, rho) — the same bias-corrected formula as
    * [[estimate]], grouped by the key columns. Every per-key sum is over
    * at most m exact binary fractions ≥ 2^-21, so it fits a double
    * mantissa exactly and is order-independent — safe to replay
    * cross-engine. This is the finalizer for pane-composed windows: merge
    * pane registers into window registers (register-wise max), then
    * estimate per window. */
  def estimatePerKey(registers: DataFrame, keyCols: Seq[String],
                     m: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "use estimate() for the unkeyed form")
    val inv = array(invPow2().map(lit): _*)
    val kc = keyCols.map(col)
    registers.groupBy(kc: _*)
      .agg(sum(element_at(inv, col("rho").cast("int"))).as("s"),
        count(lit(1)).as("filled"))
      .select(kc ++ Seq(
        (lit(alpha(m)) * m * m / (col("s") + (lit(m) - col("filled")))).as("raw"),
        (lit(m) - col("filled")).cast("double").as("zeros")): _*)
      .select(kc :+ round(
        when(col("raw") <= 2.5 * m && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")), 6).as("est"): _*)
  }

  /** Distinct-count estimate of `keyCol` in one expression chain. */
  def distinctEstimate(df: DataFrame, keyCol: String, m: Int = 32): DataFrame =
    estimate(registers(df, keyCol, m), m)
}
