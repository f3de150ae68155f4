package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Sampling

/** Pins the O(k)-state streaming sampler to the batch ranking window: the
  * same (group, rank, key) draw under (a) key-ordered chunked delivery,
  * (b) fully SHUFFLED delivery (bottom-k is order-free — the weakest
  * ordering contract of the streaming twins), and (c) one-row-per-batch
  * stress. A group smaller than k emits all its rows, still ranked. */
class SamplerStreamSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1767225600000L

  private def doc(lang: String, id: Long): SamplerStream.Doc =
    SamplerStream.Doc(lang, id, new Timestamp(base + id))

  // 4 groups of uneven size, ids interleaved across groups; one group
  // ("tiny") smaller than k
  private val all: Seq[SamplerStream.Doc] =
    (0L until 60L).map(i => doc(Seq("en", "fr", "de")((i % 3).toInt), i)) ++
      Seq(doc("tiny", 1000L), doc("tiny", 1001L))

  private def expected(k: Int): Set[(String, Int, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(Sampling.keyHash(col("doc_id")).asc, col("doc_id").asc)
    all.map(d => (d.lang, d.docId)).toDF("lang", "doc_id")
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(1))).toSet
  }

  private def run(k: Int, batches: Seq[Seq[SamplerStream.Doc]]): Set[(String, Int, Long)] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[SamplerStream.Doc]
    val out = SamplerStream.samplePerGroupStream(
      src.toDS().withWatermark("ts", "30 minutes"), k, gapMs = 60000L).toDF()
    val name = s"graft_spg_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val far = all.map(_.ts.getTime).max + 3600000L
      for (off <- Seq(0L, 1000L)) {
        src.addData(SamplerStream.Doc("~s", 0L, new Timestamp(far + 1800000L + off)))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).where(col("lang") =!= "~s")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("chunked key-ordered delivery reproduces the batch window") {
    assert(run(3, all.grouped(16).toSeq) == expected(3))
  }

  test("shuffled delivery gives the identical draw (order-free kernel)") {
    val shuffled = new scala.util.Random(7).shuffle(all)
    assert(run(3, shuffled.grouped(9).toSeq) == expected(3))
  }

  test("one-row-per-batch stress, k larger than the smallest group") {
    assert(run(5, all.map(Seq(_))) == expected(5))
    // the tiny group emitted both its rows, ranked 1..2
    val tiny = run(5, all.grouped(16).toSeq).filter(_._1 == "tiny")
    assert(tiny.map(_._2) == Set(1, 2))
  }
}
