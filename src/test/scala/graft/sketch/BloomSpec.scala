package graft.sketch

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bloom filter: no false negatives ever, deterministic false positives
  * matched by a plain-Scala mirror, and the bloom-pruned semi-join equals
  * the plain semi-join exactly. */
class BloomSpec extends AnyFunSuite with SparkTestBase {

  private val P = graft.text.TextOps.P
  private val m = 512
  private val k = 3

  private def probeScala(key: Long, i: Int): Int =
    ((((key % P + P) % P) * (2 * i + 1) + (17 * i + 3)) % P % m).toInt

  private def keysDf(keys: Seq[Long], name: String) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(keys.map(Row(_)).asJava,
      StructType(Seq(StructField(name, LongType))))
  }

  test("positions == mirror; membership has no false negatives, real FPs") {
    val rnd = new scala.util.Random(43L)
    val inserted = (0 until 150).map(_ => rnd.nextLong().abs % 1000000L).distinct
    val positions = Bloom.buildPositions(keysDf(inserted, "key"), "key", m, k)
    val mirror = inserted.flatMap(kk => (0 until k).map(probeScala(kk, _))).distinct.sorted
    assert(positions.toSeq == mirror)
    val bitSet = positions.toSet
    def mirrorContains(key: Long) = (0 until k).forall(i => bitSet(probeScala(key, i)))
    val queries = inserted ++ (0 until 400).map(_ => rnd.nextLong().abs % 1000000L)
    val bits = Bloom.bitsLit(positions, m)
    val got = keysDf(queries.distinct, "key")
      .select(col("key"), Bloom.mightContain(bits, col("key"), m, k).as("c"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    for (kk <- inserted) assert(got(kk), s"false negative on $kk")
    for ((kk, c) <- got) assert(c == mirrorContains(kk), s"mirror mismatch on $kk")
    // 450 bits set of 512 − with 400 random non-members, FPs must occur
    assert(queries.distinct.exists(kk => !inserted.contains(kk) && got(kk)),
      "fixture should produce false positives")
  }

  test("NULL keys: skipped at build (no NPE), never match at probe") {
    import scala.jdk.CollectionConverters._
    val dimWithNull = spark.createDataFrame(
      (Seq[java.lang.Long](1L, 2L, null).map(Row(_))).asJava,
      StructType(Seq(StructField("dk", LongType, nullable = true))))
    val positions = Bloom.buildPositions(dimWithNull, "dk", m, k)
    assert(positions.toSeq == Seq(1L, 2L).flatMap(kk =>
      (0 until k).map(probeScala(kk, _))).distinct.sorted)
    val factWithNull = spark.createDataFrame(
      Seq((1L, java.lang.Long.valueOf(1L)), (2L, null.asInstanceOf[java.lang.Long]),
        (3L, java.lang.Long.valueOf(2L))).map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("fk", LongType, nullable = true))))
    val got = Bloom.semiJoin(factWithNull, "fk", dimWithNull, "dk", m, k)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // the NULL-fk row never matches
  }

  test("bloom-pruned semi-join == plain semi-join") {
    val rnd = new scala.util.Random(47L)
    val dim = (0 until 80).map(_ => rnd.nextLong().abs % 5000L).distinct
    val fact = (0 until 2000).map(i => (i.toLong, rnd.nextLong().abs % 5000L))
    import scala.jdk.CollectionConverters._
    val factDf = spark.createDataFrame(
      fact.map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("fk", LongType))))
    val dimDf = keysDf(dim, "dk")
    val got = Bloom.semiJoin(factDf, "fk", dimDf, "dk", mBits = 256, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = fact.filter { case (_, fk) => dim.contains(fk) }.toSet
    assert(got == expect)
  }
}
