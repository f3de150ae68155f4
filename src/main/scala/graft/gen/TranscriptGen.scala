package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Pure function of (seed, row index) via a counter-based splitmix64 PRNG,
  * generated distributively with `spark.range` + typed map — identical
  * output for any parallelism level or partitioning, no external data.
  *
  * Shape knobs: `nConvs` conversations × `turnsPerConv` turns; tools drawn
  * Zipf(s)-skewed over `nTools` (hot keys, to exercise skew handling); a
  * `lateFrac` fraction of rows get their event time shifted earlier by up to
  * `lateMaxMs` (late arrivals within the watermark), and `veryLateFrac` by
  * up to 10× that (beyond-watermark drops).
  */
object TranscriptGen {

  final case class Config(
      nConvs: Int,
      turnsPerConv: Int,
      nTools: Int = 100,
      zipfS: Double = 1.1,
      seed: Long = 42L,
      baseMs: Long = 1767225600000L, // 2026-01-01T00:00:00Z
      stepMs: Long = 1000L,
      lateFrac: Double = 0.02,
      lateMaxMs: Long = 30000L,
      veryLateFrac: Double = 0.005) {
    def rows: Long = nConvs.toLong * turnsPerConv
  }

  val roles: Array[String] = Array("user", "assistant", "tool", "system")

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** uniform double in [0,1) from a counter */
  private def unif(seed: Long, ctr: Long, stream: Long): Double = {
    val h = splitmix64(splitmix64(seed ^ (stream * 0x632be59bd9b4e019L)) ^ ctr)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Zipf CDF over ranks 1..n with exponent s. */
  def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = (1 to n).map(r => 1.0 / math.pow(r, s)).toArray
    val tot = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    for (i <- 0 until n) { acc += w(i) / tot; cdf(i) = acc }
    cdf(n - 1) = 1.0
    cdf
  }

  def turnAt(cfg: Config, cdf: Array[Double], i: Long): Turn = {
    val conv = (i / cfg.turnsPerConv).toInt
    val turn = (i % cfg.turnsPerConv).toInt
    val u = unif(cfg.seed, i, 1L)
    var lo = java.util.Arrays.binarySearch(cdf, u)
    if (lo < 0) lo = -lo - 1
    val tool = f"tool${lo}%03d"
    val role = roles(turn % roles.length)
    // interleave conversations in event time: conversation c starts with a
    // deterministic offset inside the step window
    val jitter = (splitmix64(cfg.seed ^ conv.toLong) >>> 40) % cfg.stepMs
    var ts = cfg.baseMs + turn.toLong * cfg.stepMs + jitter
    val uLate = unif(cfg.seed, i, 2L)
    if (uLate < cfg.veryLateFrac) {
      ts -= cfg.lateMaxMs * 10 + (splitmix64(i ^ 0x5eedL) >>> 48)
    } else if (uLate < cfg.veryLateFrac + cfg.lateFrac) {
      ts -= (splitmix64(i ^ 0x1a7eL) >>> 48) % cfg.lateMaxMs
    }
    Turn(f"c${conv}%06d", turn, role, s"t-$conv-$turn", tool, new Timestamp(ts))
  }

  /** Distributed deterministic generation. */
  def generate(spark: SparkSession, cfg: Config): Dataset[Turn] = {
    import spark.implicits._
    val cdf = zipfCdf(cfg.nTools, cfg.zipfS)
    spark.range(cfg.rows).map(i => turnAt(cfg, cdf, i))
  }

  /** Local (driver-side) generation for small unit-test fixtures. */
  def generateLocal(cfg: Config): Seq[Turn] = {
    val cdf = zipfCdf(cfg.nTools, cfg.zipfS)
    (0L until cfg.rows).map(turnAt(cfg, cdf, _))
  }
}
