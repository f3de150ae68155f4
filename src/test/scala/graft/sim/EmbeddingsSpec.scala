package graft.sim

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** IVF ANN properties: probing every cell degenerates to exact brute-force
  * top-k (the candidate set is the whole corpus), and partial probing keeps
  * per-query candidate work bounded by the probed inverted lists. */
class EmbeddingsSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 8

  private def corpus(n: Int, seed: Long) = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      Row(i.toLong, (0 until dim).map(_ => rnd.nextFloat() * 2 - 1).toArray.toSeq)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
  }

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("IVF with nProbe = nCells == exact brute-force top-k") {
    val c = corpus(80, 5L)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exact = sorted(Embeddings.bruteForceTopK(q, c, k = 4))
    val full = sorted(Embeddings.ivfTopK(q, c, k = 4, nCells = 6, nProbe = 6))
    assert(full == exact)
  }

  test("partial probing returns valid ranked results with bounded candidates") {
    val c = corpus(80, 7L)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    val approx = Embeddings.ivfTopK(q, c, k = 4, nCells = 8, nProbe = 2).collect()
    assert(approx.nonEmpty)
    // ranks are 1..k per query, cosines non-increasing within a query
    approx.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.size))
      val cosines = byRank.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // approximate top-k scores never exceed the exact ones
    val exact = sorted(Embeddings.bruteForceTopK(q, c, k = 4))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._3).max }
    approx.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getDouble(2)).max <= exact(qid) + 1e-12)
    }
  }
}
