package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, and per-partition feature extraction.
  *
  * The Spark-side machinery here is real and tested — schema, partitioning,
  * batched per-partition iteration, feature column shapes. The actual media
  * decode is STUBBED (this environment ships no image/audio codecs): see
  * [[StubCodec]], a clearly-marked deterministic fake that consumes the
  * bytes and emits stable pseudo-features. Swap `StubCodec` for a real
  * decoder (e.g. TwelveMonkeys/JavaCV on executors) without touching the
  * pipeline.
  */
object Multimodal {

  /** A media asset row: payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int, height: Int, // image/video
      sample_rate: Int, // audio
      duration_ms: Long)

  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      features: Array[Float])

  /** ======== STUB: deterministic fake decoders ========
    * Real implementations would decode the payload; these derive stable
    * values from the bytes so the pipeline is end-to-end testable. */
  object StubCodec {
    /** STUB for image decode + resize + feature-extract: a 16-bin byte
      * histogram, L1-normalized — shape-compatible with a real embedding. */
    def imageFeatures(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(bytes.length, 1).toFloat
      hist.map(_ / n)
    }

    /** STUB for audio frame energy: mean absolute byte per 1/8 chunk. */
    def audioFeatures(bytes: Array[Byte]): Array[Float] = {
      val chunks = 8
      val out = new Array[Float](chunks)
      if (bytes.isEmpty) return out
      val per = math.max(bytes.length / chunks, 1)
      for (c <- 0 until chunks) {
        val from = c * per; val to = math.min(from + per, bytes.length)
        if (from < to)
          out(c) = (from until to).map(j => (bytes(j) & 0xff).toFloat).sum / (to - from)
      }
      out
    }

    /** STUB for video frame sampling: take `k` evenly spaced "frames"
      * (byte slices) and image-feature each; concatenated. */
    def videoFeatures(bytes: Array[Byte], k: Int = 4): Array[Float] = {
      if (bytes.isEmpty) return new Array[Float](16 * k)
      val frame = math.max(bytes.length / k, 1)
      (0 until k).flatMap { f =>
        imageFeatures(bytes.slice(f * frame, math.min((f + 1) * frame, bytes.length)))
      }.toArray
    }
  }

  /** Per-partition feature extraction — the Scala analog of a batched
    * `mapInPandas` decode: each partition iterates its assets once, calls
    * the (stubbed) codec, and emits fixed-shape feature rows. Runs
    * repartitioned by asset_id so decode load spreads evenly regardless of
    * upstream layout. */
  def extractFeatures(assets: Dataset[Asset], partitions: Int): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.repartition(partitions, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          val f = a.modality match {
            case "image" => StubCodec.imageFeatures(a.content)
            case "audio" => StubCodec.audioFeatures(a.content)
            case _ => StubCodec.videoFeatures(a.content)
          }
          AssetFeatures(a.asset_id, a.modality, a.content.length.toLong, f)
        }
      }
  }

  /** One sampled video frame: the explode-shaped unit a training pipeline
    * embeds per frame. */
  final case class Frame(
      asset_id: Long,
      frame_idx: Long,
      frame_ts_ms: Long,
      n_bytes: Long,
      features: Array[Float])

  /** FRAME SAMPLING for video assets: of the asset's `nFrames` (from
    * duration at `fps`), take every `stride`-th frame and emit ONE ROW PER
    * FRAME — fan-out shape, per-frame timestamps, deterministic byte-range
    * "frames" ([f·len/nFrames, (f+1)·len/nFrames) slices standing in for
    * decoded frames; a real build swaps [[StubCodec]] for a video decoder
    * without touching the fan-out). Load spreads by asset before the
    * decode, exactly like [[extractFeatures]]. The integer columns
    * (frame_idx, frame_ts_ms, n_bytes) are SQL-reproducible and drive the
    * driver oracle; features are spec-mirrored in Scala. */
  def sampleFrames(assets: Dataset[Asset], fps: Int = 10, stride: Int = 3,
                   partitions: Int = 8): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("modality") === "video")
      .repartition(partitions, col("asset_id"))
      .flatMap { a =>
        val nFrames = math.max(1L, a.duration_ms * fps / 1000L)
        val len = a.content.length.toLong
        Iterator.range(0L, nFrames, stride.toLong).map { f =>
          val from = (f * len / nFrames).toInt
          val until = ((f + 1) * len / nFrames).toInt
          val slice = java.util.Arrays.copyOfRange(a.content, from, until)
          Frame(a.asset_id, f, f * 1000L / fps, (until - from).toLong,
            StubCodec.imageFeatures(slice))
        }
      }
  }

  /** ======== REAL image decode (javax.imageio, JDK-native) ========
    * Unlike [[StubCodec]], this path decodes ACTUAL image bytes: the JDK
    * ships PNG/JPEG/BMP/GIF readers, so no external codec is needed on
    * executors. The driver gate round-trips deterministic grayscale PNGs
    * through the real encoder and decoder: pixel(x,y) = (id·31+x·7+y·13)
    * mod 256 is SQL-reproducible, PNG is lossless, so the decoded width /
    * height / pixel checksum are DuckDB-oracle-exact — the decode is
    * verified pixel-for-pixel, not shape-only. */
  object ImageCodec {
    import java.awt.image.BufferedImage

    /** Deterministic 8-bit grayscale PNG via the real JDK encoder. */
    def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    final case class Decoded(width: Int, height: Int, pixSum: Long, hist: Array[Float])

    /** Real decode: None for undecodable payloads (a corrupt asset must be
      * a skipped row, never a task failure, at pipeline scale). Features =
      * 16-bin luminance histogram over band 0, L1-normalized. */
    def decode(bytes: Array[Byte]): Option[Decoded] = {
      // Exception, not just IOException: the JDK readers throw
      // RuntimeExceptions (AIOOBE, NegativeArraySize, IllegalArgument) on
      // payloads whose magic bytes pass but whose internals are corrupt
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0L
        val hist = new Array[Float](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            hist((v & 0xff) >> 4) += 1f
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1).toFloat
        Some(Decoded(w, h, sum, hist.map(_ / n)))
      }
    }
  }

  /** ======== REAL audio decode (javax.sound.sampled, JDK-native) ========
    * Same discipline as [[ImageCodec]]: deterministic 16-bit mono PCM WAVs
    * (sample(i) = ((id·31+i·7) mod 65536) − 32768) are encoded AND decoded
    * by the actual JDK codec; PCM WAV is lossless, so decoded frame count /
    * sample rate / sample checksum are DuckDB-closed-form exact. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def syntheticWav(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
      val data = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = (((id * 31 + i * 7) % 65536) - 32768).toInt
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    final case class DecodedAudio(nSamples: Long, sampleRate: Int, sampleSum: Long)

    /** Real decode: None for undecodable payloads. Assumes 16-bit mono PCM
      * little-endian content (what [[syntheticWav]] and standard speech
      * corpora carry); sampleSum is the exact signed sum over all frames. */
    def decode(bytes: Array[Byte]): Option[DecodedAudio] =
      try {
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val buf = ais.readAllBytes()
        val n = buf.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          sum += ((buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xff)).toShort.toLong
          i += 1
        }
        Some(DecodedAudio(n.toLong, fmt.getSampleRate.toInt, sum))
      } catch { case _: Exception => None }
  }

  final case class AudioAsset(asset_id: Long, content: Array[Byte])
  final case class AudioDecoded(
      asset_id: Long, n_samples: Long, sample_rate: Long, sample_sum: Long)

  /** Distributed REAL audio decode — same shape as [[decodeImages]]. */
  def decodeAudio(assets: Dataset[AudioAsset], partitions: Int): Dataset[AudioDecoded] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.repartition(partitions, col("asset_id"))
      .mapPartitions { it =>
        it.flatMap { a =>
          AudioCodec.decode(a.content).map(d =>
            AudioDecoded(a.asset_id, d.nSamples, d.sampleRate.toLong, d.sampleSum))
        }
      }
  }

  final case class ImageAsset(asset_id: Long, content: Array[Byte])
  final case class ImageDecoded(
      asset_id: Long, width: Long, height: Long,
      n_pixels: Long, pix_sum: Long, features: Array[Float])

  /** Distributed REAL image decode: repartition by asset so decode load
    * spreads regardless of upstream layout, then one per-partition pass
    * through [[ImageCodec.decode]]. Undecodable assets are dropped (flatMap
    * of the None), the per-row cost is pure executor-local CPU, and nothing
    * here is driver-resident — the same shape at 10^9 images. */
  def decodeImages(assets: Dataset[ImageAsset], partitions: Int): Dataset[ImageDecoded] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.repartition(partitions, col("asset_id"))
      .mapPartitions { it =>
        it.flatMap { a =>
          ImageCodec.decode(a.content).map(d =>
            ImageDecoded(a.asset_id, d.width.toLong, d.height.toLong,
              d.width.toLong * d.height, d.pixSum, d.hist))
        }
      }
  }

  final case class ImageResized(
      asset_id: Long, src_w: Long, src_h: Long,
      out_w: Long, out_h: Long, pix_sum: Long)

  /** Distributed image RESIZE: real JDK decode, then a deterministic
    * nearest-neighbor downsample — src pixel (⌊x·w/outW⌋, ⌊y·h/outH⌋) for
    * each output (x, y). The kernel is explicit integer arithmetic (NOT
    * `Image.getScaledInstance`, whose interpolation is implementation-
    * defined), so the resized checksum is closed-form replayable by the
    * oracle. Same scale shape as [[decodeImages]]: repartitioned by asset,
    * executor-local CPU, nothing driver-resident. */
  def resizeImages(assets: Dataset[ImageAsset], outW: Int, outH: Int,
                   partitions: Int): Dataset[ImageResized] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(outW > 0 && outH > 0, "resize target must be positive")
    assets.repartition(partitions, col("asset_id"))
      .mapPartitions { it =>
        it.flatMap { a =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.content))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                sum += raster.getSample(x * w / outW, sy, 0)
                x += 1
              }
              y += 1
            }
            Some(ImageResized(a.asset_id, w.toLong, h.toLong,
              outW.toLong, outH.toLong, sum))
          }
        }
      }
  }

  /** Builds a deterministic asset table from any text table (payload =
    * UTF-8 bytes) — the sandbox stand-in for reading real media files. */
  def assetsFromText(docs: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3L)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"), lit(1000L).as("duration_ms"))
      .as[Asset]
  }
}
