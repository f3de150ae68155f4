package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** HyperLogLog: distributed registers == plain-Scala mirror (same hash
  * family), the merge law holds, estimates track cardinality, and the
  * linear-counting branch engages for tiny inputs. */
class HllSpec extends AnyFunSuite with SparkTestBase {

  private val P = graft.text.TextOps.P
  private val m = 32

  private def phScala(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 131 + c % P) % P)

  private def scalaRegisters(keys: Seq[String]): Map[Long, Long] = {
    val regs = scala.collection.mutable.Map[Long, Long]()
    keys.foreach { k =>
      val h = phScala(k)
      val g0 = (h * 48271L + 3L) % P
      val g1 = (h * 16807L + 17L) % P
      val bucket = g0 * m / P
      val rho =
        if (g1 == 0) 21L
        else java.lang.Long.numberOfTrailingZeros(g1) + 1L
      regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
    }
    regs.toMap
  }

  private def sparkRegisters(keys: Seq[String]): Map[Long, Long] = {
    import spark.implicits._
    HyperLogLog.registers(keys.toDF("k"), "k", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("distributed registers == plain-Scala mirror, duplicates ignored") {
    val keys = (0 until 700).map(i => s"key_$i")
    val withDups = keys ++ keys.take(300) ++ keys.take(50)
    assert(sparkRegisters(withDups) == scalaRegisters(keys))
  }

  test("merge law: registers(A ∪ B) == max-merge(registers(A), registers(B))") {
    val a = (0 until 400).map(i => s"a$i")
    val b = (0 until 400).map(i => s"b$i")
    val ra = scalaRegisters(a)
    val rb = scalaRegisters(b)
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
    assert(sparkRegisters(a ++ b) == merged)
  }

  test("estimate tracks cardinality within HLL error at m=32") {
    import spark.implicits._
    // σ ≈ 1.04/√32 ≈ 18%; allow 3σ
    for (n <- Seq(100, 1000, 5000)) {
      val est = HyperLogLog.distinctEstimate(
        (0 until n).map(i => s"v$i").toDF("k"), "k", m).head().getDouble(0)
      assert(math.abs(est - n) < 0.55 * n, s"n=$n est=$est")
    }
  }

  test("estimatePerKey == estimate run independently per key") {
    import spark.implicits._
    val rows = (0 until 900).map(i => (s"g${i % 3}", s"k${i % (100 + (i % 3) * 77)}"))
    val df = rows.toDF("g", "k")
    val keyedRegs = df
      .select(col("g"), graft.text.TextOps.polyHash(col("k")).as("h"))
      .groupBy(col("g"), HyperLogLog.bucket(col("h"), m).as("bucket"))
      .agg(max(HyperLogLog.rho(col("h"))).cast("long").as("rho"))
    val got = HyperLogLog.estimatePerKey(keyedRegs, Seq("g"), m)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val keys = rows.filter(_._1 == g).map(_._2)
      val expect = HyperLogLog.distinctEstimate(keys.toDF("k"), "k", m)
        .head().getDouble(0)
      assert(got(g) == expect, s"group $g: keyed $got vs unkeyed $expect")
    }
  }

  test("pane composition: pane-merged window registers == direct window registers") {
    import spark.implicits._
    // events at second granularity; 4 panes of 10s merge into 40s windows
    val evs = (0 until 600).map { i =>
      val t = (i * 7) % 120 // seconds
      (t.toLong / 10 * 10, s"u${i % 83}") // (pane_start, user)
    }
    val df = evs.toDF("pane", "k")
      .select(col("pane"), graft.text.TextOps.polyHash(col("k")).as("h"))
    val paneRegs = df.groupBy(col("pane"), HyperLogLog.bucket(col("h"), m).as("bucket"))
      .agg(max(HyperLogLog.rho(col("h"))).cast("long").as("rho"))
    val viaPanes = paneRegs
      .withColumn("j", explode(array((0 to 3).map(lit): _*)))
      .select((col("pane") - col("j") * 10L).as("win"), col("bucket"), col("rho"))
      .groupBy("win", "bucket").agg(max("rho").as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = df
      .withColumn("j", explode(array((0 to 3).map(lit): _*)))
      .select((col("pane") - col("j") * 10L).as("win"), col("h"))
      .groupBy(col("win"), HyperLogLog.bucket(col("h"), m).as("bucket"))
      .agg(max(HyperLogLog.rho(col("h"))).cast("long").as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaPanes == direct)
  }

  test("linear-counting branch engages for tiny cardinalities") {
    import spark.implicits._
    val n = 5
    val est = HyperLogLog.distinctEstimate(
      (0 until n).map(i => s"t$i").toDF("k"), "k", m).head().getDouble(0)
    // with 5 keys and 32 registers the raw harmonic estimate is far below
    // 2.5m, so the m·ln(m/V) branch is the one that produced `est`
    assert(est > 0 && math.abs(est - n) < 4, s"est=$est")
  }
}
