package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.dedup.Dedup

/** Streaming historical dedup: stream over doc-id-ordered micro-batches ==
  * the batch mirror (min qualifying predecessor over the LSH pair set),
  * with cross-batch bucket state, duplicate-delivery no-ops, and a
  * brute-force Scala mirror of the keeper assignment. */
class DedupStreamSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Corpus with planted near-dup clusters: base docs + one-token-appended
    * mutants + an exact copy, plus unrelated singletons. */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(17L)
    def words(k: Int, tag: String) =
      (0 until k).map(_ => s"$tag${rnd.nextInt(100000)}").mkString(" ")
    val bases = (0 until 12).map(i => (i.toLong, words(30, s"b$i")))
    val mutants = bases.map { case (id, t) => (100L + id, t + " xy") }
    val copies = bases.take(4).map { case (id, t) => (200L + id, t) }
    val singles = (0 until 10).map(i => (300L + i, words(30, s"s$i")))
    bases ++ mutants ++ copies ++ singles
  }

  private def df(rows: Seq[(Long, String)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
  }

  /** Brute-force keeper mirror: min earlier doc sharing ≥1 band with
    * signature-estimated jaccard ≥ threshold. */
  private def expected(rows: Seq[(Long, String)]): Map[Long, Long] = {
    val sigs = Dedup.minhashSignatures(df(rows), "doc_id", "text", n = 3, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def bandKeys(sig: Array[Long]): Seq[Long] =
      (0 until 4).map(j => sig.slice(j * 4, j * 4 + 4)
        .foldLeft(0L)((a, b) => (a * 131 + b) % graft.text.TextOps.P))
    def est(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y } / 16.0
    val ids = rows.map(_._1).sorted
    (for (b <- ids) yield {
      val quals = ids.filter(a => a < b &&
        bandKeys(sigs(a)).zip(bandKeys(sigs(b))).exists { case (x, y) => x == y } &&
        est(sigs(a), sigs(b)) >= 0.5)
      b -> quals.minOption
    }).collect { case (b, Some(a)) => b -> a }.toMap
  }

  private def runStream(chunks: Seq[Seq[(Long, String)]],
                        redeliver: Boolean = false): Map[Long, Long] = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val out = DedupStream.dedupStream(src.toDF().toDF("doc_id", "text"),
      "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.5)
    val name = s"dedup_stream_spec_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        src.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        if (redeliver && chunk.nonEmpty) { // duplicate delivery must no-op
          src.addData(chunk.take(3).toIndexedSeq)
          q.processAllAvailable()
        }
      }
    } finally q.stop()
    spark.table(name).groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("stream over chunked feed == batch mirror == brute force") {
    val rows = corpus.sortBy(_._1)
    val exp = expected(rows)
    assert(exp.nonEmpty, "fixture must contain planted duplicates")
    // every mutant/copy must have found its base
    assert(exp.keySet.exists(_ >= 100L))
    val got = runStream(rows.grouped(12).toSeq)
    assert(got == exp)
    val batch = DedupStream.dedupBatch(df(rows), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == exp)
  }

  test("single-batch feed == multi-batch feed (within-batch precedence)") {
    val rows = corpus.sortBy(_._1)
    assert(runStream(Seq(rows)) == runStream(rows.grouped(7).toSeq))
  }

  test("duplicate delivery is a no-op") {
    val rows = corpus.sortBy(_._1)
    assert(runStream(rows.grouped(12).toSeq, redeliver = true) == expected(rows))
  }
}
