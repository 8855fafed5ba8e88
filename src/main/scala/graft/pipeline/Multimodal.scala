package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as
 * opaque `binary` columns with typed metadata, processed
 * partition-parallel in batches. The Spark-side contract — schema,
 * partitioning, batch shape, deterministic outputs — is real and
 * tested; the codec itself is a STUB (this container has no
 * image/audio libraries), clearly marked below, swapped for a real
 * decoder (JNI/FFI or Pandas-UDF equivalent) in production.
 */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,           // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      histogram: Array[Double], // 16-bin byte-value histogram
      frames_sampled: Int,
      frame_hashes: Array[Long])

  /** Deterministic synthetic corpus derived from the documents table —
    * payload bytes are the doc text (a stand-in blob), metadata typed
    * as a real pipeline would carry it. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames"))

  // ====================================================================
  // STUB DECODER — deterministic fake in place of a real codec.
  // A production build replaces `decodeBatch` with the real
  // image/audio/video library call; everything around it (schema,
  // batch iteration, partition parallelism) stays as-is.
  // ====================================================================
  private def decodeBatch(records: Iterator[MediaRecord], frameStride: Int): Iterator[MediaFeatures] =
    records.map { r =>
      val bytes = r.payload
      val hist = new Array[Double](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0; i += 1 }
      if (bytes.length > 0) { var j = 0; while (j < 16) { hist(j) /= bytes.length; j += 1 } }
      // "frame sampling": every frameStride-th 64-byte slice, hashed.
      val frames = bytes.grouped(64).zipWithIndex
        .collect { case (chunk, idx) if idx % frameStride == 0 =>
          java.util.Arrays.hashCode(chunk).toLong }
        .toArray
      MediaFeatures(r.media_id, r.kind, bytes.length, hist, frames.length, frames)
    }

  /** Feature extraction: mapPartitions keeps the (stub) codec call
    * batched per partition — the Scala analogue of mapInPandas batch
    * shape — so a real decoder amortizes model/codec init per
    * partition, not per row. */
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
