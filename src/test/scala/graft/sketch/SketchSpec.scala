package graft.sketch

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Count-Min sketch: distributed table == plain-Scala sketch mirror
  * (bit-exact, same hash family), the one-sided error guarantee holds
  * exactly, and the overestimate stays within the εN bound. */
class SketchSpec extends AnyFunSuite with SparkTestBase {

  private val P = graft.text.TextOps.P

  private def phScala(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 131 + c % P) % P)

  private def docsDf(rows: Seq[String]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  /** Zipf-ish corpus: token t_i appears ~ 1/i as often. */
  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(31L)
    (0 until 200).map { _ =>
      (0 until 40).map { _ =>
        val i = math.min(399, (math.pow(rnd.nextDouble(), 2.5) * 400).toInt)
        s"tok$i"
      }.mkString(" ")
    }
  }

  test("sketch table and estimates == plain-Scala mirror; CM bounds hold") {
    val depth = 4
    val width = 256
    val docs = docsDf(corpus)
    val occs = corpus.flatMap(_.split("\\s+"))
    val exact = occs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // scala mirror sketch
    val cm = Array.fill(depth, width)(0L)
    for (tok <- occs; r <- 0 until depth) {
      val b = (((phScala(tok) * (2 * r + 1) + (17 * r + 3)) % P) % width).toInt
      cm(r)(b) += 1
    }
    def mirrorEst(tok: String): Long =
      (0 until depth).map { r =>
        cm(r)((((phScala(tok) * (2 * r + 1) + (17 * r + 3)) % P) % width).toInt)
      }.min
    // distributed table must equal the mirror cell-for-cell
    val table = CountMin.sketchTable(
      docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .withColumn("w", lit(1L)), "tok", "w", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    for (r <- 0 until depth; b <- 0 until width if cm(r)(b) != 0)
      assert(table.getOrElse((r, b), 0L) == cm(r)(b), s"cell ($r,$b)")
    assert(table.values.sum == cm.map(_.sum).sum)
    // estimates == mirror, est >= exact always, overestimate <= eps*N
    val est = CountMin.tokenHeavyHitters(docs, "text", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    val n = occs.size.toLong
    val eps = math.E / width
    for ((tok, e) <- est) {
      assert(e == mirrorEst(tok), tok)
      assert(e >= exact(tok), s"$tok: CM must never underestimate")
      assert(e <= exact(tok) + (eps * n).ceil.toLong * 4,
        s"$tok: overestimate ${e - exact(tok)} far beyond eps*N")
    }
    // the sketch actually sketched: some collision produced an overestimate
    assert(est.exists { case (tok, e) => e > exact(tok) },
      "fixture should exercise collisions (width 256 vs 400 keys)")
  }

  test("estimate of an uninserted key is 0 (left-join coalesce path)") {
    import scala.jdk.CollectionConverters._
    val docs = docsDf(Seq("a b c"))
    val table = CountMin.sketchTable(
      docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .withColumn("w", lit(1L)), "tok", "w", 4, 1024)
    val keys = spark.createDataFrame(Seq(Row("zz_absent")).asJava,
      StructType(Seq(StructField("tok", StringType))))
    val est = CountMin.estimates(table, keys, "tok", 4, 1024).collect()
    // width 1024 with 3 inserted keys: an absent key may still collide on
    // some rows, but min over 4 rows with empty buckets coalesced to 0
    // must give 0 unless ALL four buckets collide (impossible here: 3 keys
    // x 4 rows fill at most 12 of 4096 cells and min takes the empty one)
    assert(est.head.getLong(1) == 0L)
  }
}
