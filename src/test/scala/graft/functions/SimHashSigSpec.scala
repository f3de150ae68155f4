package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.Dedup

/** The native one-pass SimHashSig must be bit-identical to the nested
  * higher-order-function formulation it replaced (which is what the DuckDB
  * s4 oracle CTE reproduces). */
class SimHashSigSpec extends AnyFunSuite with SparkTestBase {

  private def texts: Seq[String] = {
    val r = new scala.util.Random(123L)
    val words = Seq("the", "quick", "brown", "fox", "jumps", "alpha", "beta",
      "gamma", "zz9", "q", "longerwordhere", "x1", "x2")
    Seq("", " ", "one", "one two", "a b c d e f g h") ++
      (0 until 120).map(_ =>
        (0 until r.nextInt(25)).map(_ => words(r.nextInt(words.size))).mkString(" "))
  }

  test("native expression == nested-HOF formulation") {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val rows = df.select(
      Dedup.simhashBands(col("text")).as("native"),
      Dedup.simhashBandsHof(col("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("interpreted eval == codegen; empty tokens give all-zero bands") {
    import spark.implicits._
    val df = texts.toDF("text")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(Dedup.simhashBands(col("text"))).collect().map(_.getSeq[Long](0))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = df.select(Dedup.simhashBands(col("text"))).collect().map(_.getSeq[Long](0))
      assert(interp.toSeq == gen.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    val empty = df.where(length(trim(col("text"))) === 0)
      .select(Dedup.simhashBands(col("text"))).collect()
    empty.foreach(r => assert(r.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L)))
  }
}
