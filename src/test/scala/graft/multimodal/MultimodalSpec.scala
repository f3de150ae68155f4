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

  test("ImageCodec: real PNG encode→decode round-trip is pixel-exact") {
    for (id <- Seq(0L, 7L, 123L, 499L)) {
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val png = Multimodal.ImageCodec.syntheticPng(id, w, h)
      // a real PNG payload, not a fake: magic bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val d = Multimodal.ImageCodec.decode(png).get
      assert(d.width == w && d.height == h)
      var expectSum = 0L
      val expectHist = new Array[Float](16)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        expectSum += v
        expectHist(v >> 4) += 1f
      }
      assert(d.pixSum == expectSum)
      assert(d.hist.toSeq == expectHist.map(_ / (w * h)).toSeq)
    }
    // corrupt payloads are skipped rows, not task failures
    assert(Multimodal.ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("AudioCodec: real WAV encode→decode round-trip is sample-exact") {
    for (id <- Seq(0L, 9L, 250L, 499L)) {
      val ns = (200 + (id % 23) * 8).toInt
      val wav = Multimodal.AudioCodec.syntheticWav(id, ns)
      // a real RIFF/WAVE payload
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val d = Multimodal.AudioCodec.decode(wav).get
      assert(d.nSamples == ns && d.sampleRate == 8000)
      val expect = (0 until ns).map(i => ((id * 31 + i * 7) % 65536) - 32768).sum
      assert(d.sampleSum == expect)
    }
    assert(Multimodal.AudioCodec.decode("not audio".getBytes).isEmpty)
  }

  test("decodeImages: distributed decode drops undecodable assets") {
    import spark.implicits._
    val assets = spark.createDataset((0L until 20L).map { id =>
      if (id % 5 == 4) Multimodal.ImageAsset(id, Array[Byte](1, 2, 3)) // corrupt
      else Multimodal.ImageAsset(id,
        Multimodal.ImageCodec.syntheticPng(id, (8 + id % 9).toInt, (8 + id % 7).toInt))
    })
    val out = Multimodal.decodeImages(assets, partitions = 4).collect()
      .map(d => d.asset_id -> d).toMap
    assert(out.keySet == (0L until 20L).filter(_ % 5 != 4).toSet)
    for ((id, d) <- out) {
      assert(d.width == 8 + id % 9 && d.height == 8 + id % 7)
      assert(d.n_pixels == d.width * d.height)
    }
  }
}
