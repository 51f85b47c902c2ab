package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal item: opaque media bytes + typed metadata. */
final case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    media: Array[Byte], // opaque payload
    source: String)

/** Decoded/extracted features for one media item. */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    duration_ms: Int,
    embedding: Array[Float],
    n_frames_sampled: Int,
    decoded: Boolean) // true = a REAL codec decoded the payload

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in partition-sized batches via `mapPartitions` (the
 * Scala analogue of a Pandas-UDF `mapInPandas` pipeline — same batch shape,
 * schema contract, and partitioning concerns).
 *
 * Decode is REAL where the JDK carries a codec: images (PNG/JPEG/BMP/GIF via
 * `javax.imageio`, headless-safe) and audio (RIFF/WAV PCM via
 * `javax.sound.sampled`) are actually decoded — exact pixel dimensions, a
 * content-based 4x4 grid mean-luminance embedding, exact PCM duration.
 * Video runs a REAL demux -> bounded frame-sample -> per-frame codec decode
 * -> pooled-embedding path for MPNG containers (see [[encodeMpng]]); general
 * containers (MP4/MKV) would slot a demuxer into the same path but need
 * FFmpeg, absent in this sandbox. Payloads nothing can parse fall back to
 * the clearly-marked deterministic STUB so the pipeline shape stays total;
 * `MediaFeatures.decoded` records which path a row took.
 */
object Multimodal {

  /** REAL image decode via the JDK's built-in ImageIO (PNG/JPEG/BMP/GIF, no
   * external codecs, no display needed): exact (width, height) plus a 16-dim
   * content embedding — mean luminance over a 4x4 grid, L2-normalized (a
   * miniature pooled feature head). None when the payload is not a decodable
   * image. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val acc = new Array[Double](16)
        val cnt = new Array[Long](16)
        var y = 0
        while (y < h) {
          val gy = math.min(3, y * 4 / h)
          var x = 0
          while (x < w) {
            val gx = math.min(3, x * 4 / w)
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            val g = gy * 4 + gx
            acc(g) += lum
            cnt(g) += 1
            x += 1
          }
          y += 1
        }
        val emb = new Array[Float](16)
        var i = 0
        while (i < 16) {
          emb(i) = if (cnt(i) > 0) (acc(i) / cnt(i)).toFloat else 0f
          i += 1
        }
        val n = math.sqrt(emb.map(v => v.toDouble * v).sum)
        if (n > 0) {
          var j = 0
          while (j < 16) { emb(j) = (emb(j) / n).toFloat; j += 1 }
        }
        Some((w, h, emb))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via the JDK's built-in WAV reader: exact duration in
   * milliseconds from the PCM frame count and rate. None when the payload is
   * not parseable audio. */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[Int] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val frames = ais.getFrameLength
      val rate = ais.getFormat.getFrameRate
      if (frames > 0 && rate > 0) Some((frames * 1000.0 / rate).toInt) else None
    } catch { case _: Exception => None }

  // --------------------------------------------------------------------
  // MPNG: a minimal deterministic motion-picture container (length-prefixed
  // PNG frames) so a REAL demux -> per-frame codec decode -> frame-sample
  // path runs end-to-end in-sandbox. General video containers (MP4/MKV/AVI)
  // still need an external demuxer (FFmpeg) and take the stub; the Spark-
  // side plumbing — schema, batch shape, sampling, pooled embedding — is
  // identical for both, which is the part that matters at scale.
  // Layout: "MPNG" magic, int32 fps, int32 frameCount, then frameCount x
  // (int32 len, PNG bytes), all big-endian.
  // --------------------------------------------------------------------

  private val MpngMagic = 0x4d504e47 // "MPNG"

  /** Encodes PNG frames into the MPNG container. */
  private[graft] def encodeMpng(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty, "MPNG needs fps > 0 and at least one frame")
    val total = 12 + frames.map(4 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.putInt(MpngMagic).putInt(fps).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Demuxed + decoded video features: frame-0 dimensions, container
   * duration, total frame count, number of frames actually decoded by the
   * sampler, and the pooled (mean over sampled frames, L2-normalized)
   * 16-dim luminance embedding. */
  private[graft] final case class VideoFeatures(
      width: Int,
      height: Int,
      durationMs: Int,
      nFrames: Int,
      nSampled: Int,
      embedding: Array[Float])

  /** REAL video path for MPNG containers: demux the frame table, decode a
   * bounded sample of frames (ceil-stride so <= maxSample regardless of
   * length — the knob that keeps per-row decode cost flat on long videos),
   * pool their embeddings. None when the payload is not MPNG or any sampled
   * frame fails to decode. */
  private[graft] def demuxVideo(
      bytes: Array[Byte],
      maxSample: Int = 8): Option[VideoFeatures] =
    try {
      if (bytes.length < 12) return None
      val buf = java.nio.ByteBuffer.wrap(bytes)
      if (buf.getInt() != MpngMagic) return None
      val fps = buf.getInt()
      val n = buf.getInt()
      if (fps <= 0 || n <= 0 || n > 1000000) return None
      // index the frame table without touching pixel data
      val offsets = new Array[Int](n)
      val lengths = new Array[Int](n)
      var i = 0
      var pos = 12
      while (i < n) {
        if (pos + 4 > bytes.length) return None
        val len = buf.getInt(pos)
        if (len <= 0 || pos + 4 + len > bytes.length) return None
        offsets(i) = pos + 4
        lengths(i) = len
        pos += 4 + len
        i += 1
      }
      val stride = math.max(1, (n + maxSample - 1) / maxSample)
      val acc = new Array[Double](16)
      var sampled = 0
      var w = 0
      var h = 0
      var f = 0
      while (f < n) {
        val frame = java.util.Arrays.copyOfRange(bytes, offsets(f), offsets(f) + lengths(f))
        decodeImage(frame) match {
          case Some((fw, fh, emb)) =>
            if (sampled == 0) { w = fw; h = fh }
            var d = 0
            while (d < 16) { acc(d) += emb(d); d += 1 }
            sampled += 1
          case None => return None
        }
        f += stride
      }
      if (sampled == 0) return None
      val emb = new Array[Float](16)
      var d = 0
      while (d < 16) { emb(d) = (acc(d) / sampled).toFloat; d += 1 }
      val norm = math.sqrt(emb.map(v => v.toDouble * v).sum)
      if (norm > 0) {
        var j = 0
        while (j < 16) { emb(j) = (emb(j) / norm).toFloat; j += 1 }
      }
      Some(VideoFeatures(w, h, (n.toLong * 1000 / fps).toInt, n, sampled, emb))
    } catch { case _: Exception => None }

  /** STUB decode: deterministic pseudo-metadata from the payload bytes —
   * the fallback for payloads no JDK codec parses (general video containers
   * need an external demuxer, e.g. FFmpeg, outside this sandbox). */
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
   * doesn't straggle. Real codecs are tried first (image/audio); payloads
   * they reject take the deterministic stub with `decoded = false`.
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
          val nBytes = row.media.length.toLong
          val frames = sampleFrames(row.media_type, row.media)
          row.media_type match {
            case "image" =>
              decodeImage(row.media) match {
                case Some((w, h, emb)) =>
                  MediaFeatures(row.media_id, "image", nBytes, w, h, 0, emb, frames,
                    decoded = true)
                case None =>
                  val (w, h, d) = decodeStub("image", row.media)
                  MediaFeatures(row.media_id, "image", nBytes, w, h, d,
                    embedStub(row.media), frames, decoded = false)
              }
            case "audio" =>
              decodeAudio(row.media) match {
                case Some(durMs) =>
                  MediaFeatures(row.media_id, "audio", nBytes, 0, 0, durMs,
                    embedStub(row.media), frames, decoded = true)
                case None =>
                  val (w, h, d) = decodeStub("audio", row.media)
                  MediaFeatures(row.media_id, "audio", nBytes, w, h, d,
                    embedStub(row.media), frames, decoded = false)
              }
            case "video" =>
              demuxVideo(row.media) match {
                case Some(vf) =>
                  MediaFeatures(row.media_id, "video", nBytes, vf.width, vf.height,
                    vf.durationMs, vf.embedding, vf.nSampled, decoded = true)
                case None =>
                  val (w, h, d) = decodeStub("video", row.media)
                  MediaFeatures(row.media_id, "video", nBytes, w, h, d,
                    embedStub(row.media), frames, decoded = false)
              }
            case other =>
              val (w, h, d) = decodeStub(other, row.media)
              MediaFeatures(row.media_id, other, nBytes, w, h, d,
                embedStub(row.media), frames, decoded = false)
          }
        }
      }
  }

  /** Deterministic synthetic media table. Image rows are REAL PNGs
   * (deterministic noise pixels), audio rows are REAL 8 kHz 16-bit PCM
   * WAVs, and most video rows are REAL MPNG containers (length-prefixed PNG
   * frames, demuxed + per-frame ImageIO-decoded by [[demuxVideo]]); every
   * third video row (ids ≡ 2 mod 9) stays opaque noise bytes so the stub
   * fallback is exercised alongside the real path. */
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
      val bytes: Array[Byte] = t match {
        case "image" =>
          val w = 64 + (next() & 0x3f).toInt
          val h = 64 + (next() & 0x3f).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (next() & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          baos.toByteArray
        case "audio" =>
          // 8 kHz mono 16-bit PCM, 1.0-3.0 s => duration_ms in [1000, 3000]
          val nSamples = 8000 + (next() >>> 50).toInt // + up to 16383
          val pcm = new Array[Byte](nSamples * 2)
          var i = 0
          while (i < nSamples) {
            val v = (next() >>> 48).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem
            .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          baos.toByteArray
        case _ =>
          // REAL MPNG container: 3-10 small deterministic-noise PNG frames
          // at 4 fps (odd ids); every third video row stays opaque noise
          // bytes to keep the stub fallback exercised alongside the real
          // demux path
          if (id % 9 == 2) {
            val len = 256 + (next() >>> 52).toInt * 7 // up to ~29 KiB
            val arr = new Array[Byte](len)
            var i = 0
            while (i < len) {
              arr(i) = (next() >>> 56).toByte
              i += 1
            }
            arr
          } else {
            val nFrames = 3 + (next() & 0x7).toInt // 3-10
            val w = 24 + (next() & 0xf).toInt
            val h = 16 + (next() & 0x7).toInt
            val frames = (0 until nFrames).map { _ =>
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  img.setRGB(x, y, (next() & 0xffffff).toInt)
                  x += 1
                }
                y += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              baos.toByteArray
            }
            encodeMpng(frames, 4)
          }
      }
      MediaRow(id, t, bytes, s"src${(next() >>> 60).toInt}")
    }
  }
}
