package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal item: opaque media bytes + typed metadata. */
final case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    media: Array[Byte], // opaque payload (decode is a stub in this sandbox)
    source: String)

/** Decoded/extracted features for one media item. */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int, // stubbed decode metadata
    height: Int,
    duration_ms: Int,
    embedding: Array[Float], // stubbed feature vector (deterministic)
    n_frames_sampled: Int)

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in partition-sized batches via `mapPartitions` (the
 * Scala analogue of a Pandas-UDF `mapInPandas` pipeline — same batch shape,
 * schema contract, and partitioning concerns).
 *
 * The decode step is a clearly-marked STUB: the image/audio codecs are not
 * present in this container, so `decodeStub` derives deterministic fake
 * dimensions/durations and a deterministic pooled byte-histogram embedding
 * from the raw bytes. Everything around it — schema, batching, partition
 * sizing by payload bytes, feature extraction shape, frame sampling — is the
 * real distributed plumbing a production decoder would drop into.
 */
object Multimodal {

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
   * Replace with a real codec (JPEG/PNG/FFmpeg) outside this sandbox. */
  private[multimodal] def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val h = graft.sketches.Hashing.hashBytes(bytes)
    mediaType match {
      case "image" => (64 + ((h & 0x3ff).toInt), 64 + (((h >>> 10) & 0x3ff).toInt), 0)
      case "audio" => (0, 0, 1000 + ((h & 0xffff).toInt))
      case _       => (320 + ((h & 0xff).toInt), 240 + (((h >>> 8) & 0xff).toInt),
        2000 + (((h >>> 16) & 0xffff).toInt))
    }
  }

  /** STUB feature extraction: 16-dim pooled byte histogram, L2-normalized —
   * deterministic, shaped like a real embedding head's output. */
  private[multimodal] def embedStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      acc((bytes(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val n = math.sqrt(acc.map(x => x.toDouble * x).sum)
    if (n > 0) acc.map(x => (x / n).toFloat) else acc
  }

  /** STUB frame sampling: one "frame" per 4 KiB of payload, capped. */
  private[multimodal] def sampleFrames(mediaType: String, bytes: Array[Byte]): Int =
    if (mediaType == "video") math.min(32, 1 + bytes.length / 4096) else 0

  /**
   * The extraction pipeline: batch-iterate each partition, decode + embed +
   * frame-sample. Payload-heavy rows are balanced across partitions first
   * (range partitioning on payload size) so one partition of large videos
   * doesn't straggle.
   */
  def extractFeatures(media: Dataset[MediaRow], targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts =
      if (targetPartitions > 0) targetPartitions else spark.sparkContext.defaultParallelism
    media
      .withColumn("__sz", length(col("media")))
      .repartitionByRange(parts, col("__sz"), col("media_id"))
      .drop("__sz")
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { row =>
          val (w, h, d) = decodeStub(row.media_type, row.media)
          MediaFeatures(
            row.media_id,
            row.media_type,
            row.media.length.toLong,
            w,
            h,
            d,
            embedStub(row.media),
            sampleFrames(row.media_type, row.media))
        }
      }
  }

  /** Deterministic synthetic media table (payload = deterministic bytes). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 9L): Dataset[MediaRow] = {
    import spark.implicits._
    val types = Array("image", "audio", "video")
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      var s = seed ^ (id * 0x9e3779b97f4a7c15L)
      def next(): Long = {
        s += 0x9e3779b97f4a7c15L
        var z = s
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val t = types((id % 3).toInt)
      val len = 256 + (next() >>> 52).toInt * 7 // up to ~29 KiB
      val bytes = new Array[Byte](len)
      var i = 0
      while (i < len) {
        bytes(i) = (next() >>> 56).toByte
        i += 1
      }
      MediaRow(id, t, bytes, s"src${(next() >>> 60).toInt}")
    }
  }
}
