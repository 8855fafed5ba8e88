package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as
 * opaque `binary` columns with typed metadata, processed
 * partition-parallel in batches. Image and audio decode are REAL
 * codecs from the public JDK standard library — `javax.imageio`
 * (PNG/JPEG/BMP) and `javax.sound.sampled` (WAV/PCM) — exercised on
 * payloads the fixture generator actually encodes with the same
 * codecs. Video has no JDK codec, so its per-frame decode stays a
 * metadata-driven deterministic plan (frame indices sampled by
 * stride); a production build swaps in an FFI decoder behind the same
 * mapPartitions batch shape.
 */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,           // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  /** Decoded features; fields are per-kind (null where not
    * applicable) so every value the decoder emits is exact and
    * externally checkable. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width_px: Option[Int], height_px: Option[Int],
      dominant_bin: Option[Int], dominant_frac: Option[Double],
      sample_rate_hz: Option[Int], n_samples: Option[Long], peak: Option[Int],
      frames_sampled: Option[Int])

  /** Encode a w×h PNG where every pixel is the same gray level —
    * deterministic, so decoded features are externally predictable. */
  def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a mono 16-bit little-endian PCM WAV of n constant-value
    * samples. */
  def wavBytes(sampleRate: Int, amplitude: Int, n: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      data(2 * i) = (amplitude & 0xFF).toByte
      data(2 * i + 1) = ((amplitude >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic corpus derived from the documents table:
    * payloads are REAL PNG / WAV bytes encoded from doc_id-derived
    * parameters (video payloads stay opaque text bytes — no JDK
    * codec), metadata typed as a real pipeline would carry it. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 1).toInt
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => pngBytes(w, h, (id % 256).toInt)
          case "audio" => wavBytes(16000, (id % 1000).toInt, (id % 100 + 10).toInt)
          case _       => text.getBytes("UTF-8")
        }
        MediaRecord(id, kind, payload, w, h, 16000, (id % 30 + 1).toInt)
    }.toDF()
  }

  /** Real per-batch decode: ImageIO for images (any JDK-supported
    * container — PNG/JPEG/BMP/GIF), javax.sound.sampled for audio
    * (WAV/AU/AIFF PCM). Video: no JDK codec exists, so frame sampling
    * is planned from metadata (every frameStride-th of n_frames). */
  private def decodeBatch(records: Iterator[MediaRecord],
      frameStride: Int): Iterator[MediaFeatures] =
    records.map { r =>
      r.kind match {
        case "image" =>
          val img = ImageIO.read(new ByteArrayInputStream(r.payload))
          require(img != null, s"media_id=${r.media_id}: undecodable image")
          val w = img.getWidth; val h = img.getHeight
          // 16-bin luminance histogram; dominant bin + its share
          val hist = new Array[Long](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
              hist(lum / 16) += 1
              x += 1
            }
            y += 1
          }
          val dom = hist.indices.maxBy(hist(_))
          val total = w.toLong * h
          MediaFeatures(r.media_id, r.kind, Some(w), Some(h),
            Some(dom), Some(hist(dom).toDouble / total),
            None, None, None, None)
        case "audio" =>
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          val n = ais.getFrameLength
          val bytes = ais.readAllBytes()
          // peak |sample| over 16-bit little-endian PCM
          var peak = 0
          var i = 0
          while (i + 1 < bytes.length) {
            val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 2
          }
          MediaFeatures(r.media_id, r.kind, None, None, None, None,
            Some(fmt.getSampleRate.toInt), Some(n), Some(peak), None)
        case _ => // video: metadata-planned frame sampling, no JDK codec
          val sampled = (r.n_frames + frameStride - 1) / frameStride
          MediaFeatures(r.media_id, r.kind, None, None, None, None,
            None, None, None, Some(sampled))
      }
    }

  /** Feature extraction: mapPartitions keeps the codec call batched
    * per partition — the Scala analogue of mapInPandas batch shape —
    * so decoder/codec init amortizes per partition, not per row. */
  def extractFeatures(media: DataFrame, frameStride: Int = 2): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(it => decodeBatch(it, frameStride))
  }

  /** Resize metadata transform (pure column math — no decode needed):
    * clamps to maxDim preserving aspect ratio. */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
    media.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
