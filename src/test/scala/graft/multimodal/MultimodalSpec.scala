package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Multimodal plumbing: fan-out shape, per-frame metadata, and the stubbed
  * feature content against plain-Scala mirrors (the oracle gate covers the
  * integer columns; this pins the float features too). */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until 30).map(i => Row(i.toLong, s"doc $i " + ("x" * (i % 7))))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("extractFeatures: shapes and stub content match the codec directly") {
    val feats = Multimodal.extractFeatures(
      Multimodal.assetsFromText(docsDf, "doc_id", "text"), partitions = 4)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats.size == 30)
    for (i <- 0 until 30) {
      val text = s"doc $i " + ("x" * (i % 7))
      val bytes = text.getBytes("UTF-8")
      val f = feats(i.toLong)
      assert(f.n_bytes == bytes.length)
      val expect = (i % 3) match {
        case 0 => Multimodal.StubCodec.imageFeatures(bytes)
        case 1 => Multimodal.StubCodec.audioFeatures(bytes)
        case _ => Multimodal.StubCodec.videoFeatures(bytes)
      }
      assert(f.features.toSeq == expect.toSeq, s"asset $i")
    }
  }

  test("sampleFrames: fan-out, timestamps, byte ranges, per-frame features") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assetsFromText(docsDf, "doc_id", "text"),
      fps = 10, stride = 3, partitions = 4).collect()
    val videoIds = (0 until 30).filter(_ % 3 == 2)
    // 10 frames per asset at 1000ms/10fps, stride 3 → indices 0,3,6,9
    assert(frames.groupBy(_.asset_id).keySet == videoIds.map(_.toLong).toSet)
    for (fr <- frames) {
      assert(Seq(0L, 3L, 6L, 9L).contains(fr.frame_idx))
      assert(fr.frame_ts_ms == fr.frame_idx * 100)
      val text = s"doc ${fr.asset_id} " + ("x" * (fr.asset_id.toInt % 7))
      val bytes = text.getBytes("UTF-8")
      val len = bytes.length.toLong
      val from = (fr.frame_idx * len / 10).toInt
      val until = ((fr.frame_idx + 1) * len / 10).toInt
      assert(fr.n_bytes == until - from)
      val slice = java.util.Arrays.copyOfRange(bytes, from, until)
      assert(fr.features.toSeq == Multimodal.StubCodec.imageFeatures(slice).toSeq)
    }
    assert(frames.length == videoIds.size * 4)
  }
}
