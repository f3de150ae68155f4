package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextOps

/** The native codegen'd PolyHash must be bit-identical to the pure
  * higher-order-function formulation it replaced (which is what the DuckDB
  * oracles reproduce). */
class PolyHashSpec extends AnyFunSuite with SparkTestBase {

  private def strings: Seq[String] = {
    val r = new scala.util.Random(99L)
    val ascii = (32 to 126).map(_.toChar)
    Seq("", " ", "a", "the quick brown fox", "x" * 500) ++
      (0 until 200).map(_ => (0 until r.nextInt(60)).map(_ =>
        ascii(r.nextInt(ascii.size))).mkString)
  }

  test("native expression == HOF formulation on ASCII strings") {
    import spark.implicits._
    val df = strings.toDF("s")
    val rows = df.select(
      TextOps.polyHash(col("s")).as("native"),
      TextOps.polyHashHof(col("s")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("interpreted eval == codegen (and matches driver-side fold)") {
    import spark.implicits._
    val df = strings.toDF("s")
    // interpreted path: wholeStage off
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(TextOps.polyHash(col("s"))).collect().map(_.getLong(0))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = df.select(TextOps.polyHash(col("s"))).collect().map(_.getLong(0))
      assert(interp.toSeq == gen.toSeq)
      assert(interp.toSeq == strings.map(PolyHash.hash))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("native MinHashSig == HOF formulation (incl. empty shingle sets)") {
    import spark.implicits._
    import graft.dedup.Dedup
    val docs = (strings :+ "" :+ "one two").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val rows = docs.select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 16,
        Dedup.PortableHash).as("native"),
      Dedup.minhashSignatureHof(Dedup.shingles(col("text"), 3), 16,
        Dedup.PortableHash).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("usable inside higher-order-function lambdas (minhash path)") {
    import spark.implicits._
    val df = Seq(Seq("ab", "cd", "ef")).toDF("arr")
    val got = df.select(transform(col("arr"), s => TextOps.polyHash(s))).collect()(0)
      .getSeq[Long](0)
    assert(got == Seq("ab", "cd", "ef").map(PolyHash.hash))
  }
}
