package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column operators: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / resize / frame-sample operators.
 *
 * The image and audio paths are REAL codecs with zero new dependencies:
 * images are genuine PNG/BMP bytes decoded through `javax.imageio`
 * (dimensions and checksums come from actual decoded pixels), audio is
 * genuine RIFF/WAVE PCM parsed from its fmt/data chunks. Video is the one
 * remaining declared container format (a 24-byte "GVID" header + payload) —
 * the JDK ships no video codec and this environment allows no new jars; the
 * frame-sampling operator works off its parsed metadata and the decode shape
 * (per-partition batched mapPartitions) is exactly where a JavaCV-style
 * decoder would slot in.
 *
 * Distribution shape: decode/resize run as `mapPartitions` so per-partition
 * codec setup (ImageIO cache off) amortizes, no driver-side work, and the
 * binary payloads never shuffle except where the query demands it.
 */
object MediaOps {

  final case class MediaFile(
      mediaId: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int, // -1 when not applicable
      height: Int,
      sampleRate: Int,
      frames: Int)

  final case class DecodedMeta(
      mediaId: Long,
      kind: String,
      format: String, // png | bmp | wav | gvid
      width: Int,
      height: Int,
      sampleRate: Int,
      frames: Int,
      byteLen: Int,
      checksum: Long) // decoded-content checksum (pixels / samples), not raw bytes

  // ------------------------------------------------------------------
  // encoders (deterministic content from the id; real container formats)
  // ------------------------------------------------------------------

  /** Deterministic RGB pixel for (id, x, y) — a splitmix-style mix so every
   * pixel is reproducible on any executor. */
  @inline private def pixel(id: Long, x: Int, y: Int): Int = {
    var z = id * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L + y * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z >>> 40).toInt & 0xFFFFFF)
  }

  /** Real PNG or BMP bytes (format by flag) with deterministic pixels. */
  def encodeImage(id: Long, w: Int, h: Int, png: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (png) "png" else "bmp", bos)
    bos.toByteArray
  }

  /** Real RIFF/WAVE bytes: PCM16 mono, deterministic samples. */
  def encodeWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      // deterministic pseudo-waveform (sine + id-seeded harmonic)
      val s = (math.sin(2 * math.Pi * (220 + id % 200) * i / sampleRate) * 12000).toShort
      bb.putShort(s)
      i += 1
    }
    bb.array()
  }

  /** Declared minimal video container: magic "GVID", width, height, fps,
   * frames, then an opaque payload (the JDK has no video codec; documented
   * above). */
  def encodeGvid(id: Long, w: Int, h: Int, fps: Int, frames: Int): Array[Byte] = {
    val payloadLen = 256 + (id % 512).toInt
    val bb = java.nio.ByteBuffer.allocate(20 + payloadLen)
    bb.put("GVID".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(fps).putInt(frames)
    var x = id
    (0 until payloadLen).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    bb.array()
  }

  /** Synthetic media table with REAL blobs, generated distributed. PNG and
   * BMP alternate so both image decoders are exercised. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      javax.imageio.ImageIO.setUseCache(false)
      (id % 3) match {
        case 0 =>
          val w = 24 + (id % 8).toInt * 8; val h = 16 + (id % 5).toInt * 8
          MediaFile(id, "image", encodeImage(id, w, h, png = id % 2 == 0), w, h, -1, 1)
        case 1 =>
          val rate = Seq(8000, 16000, 44100)(((id / 3) % 3).toInt)
          val nSamples = 500 + (id % 1000).toInt
          MediaFile(id, "audio", encodeWav(id, rate, nSamples), -1, -1, rate, nSamples)
        case _ =>
          val fr = 24 + (id % 4).toInt * 6
          MediaFile(id, "video", encodeGvid(id, 320, 240, 24, fr), 320, 240, -1, fr)
      }
    }
  }

  // ------------------------------------------------------------------
  // decoder (magic-byte sniffing; real parsing per format)
  // ------------------------------------------------------------------

  private def isPng(b: Array[Byte]) = b.length > 8 &&
    (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isBmp(b: Array[Byte]) = b.length > 2 && b(0) == 'B' && b(1) == 'M'
  private def isWav(b: Array[Byte]) = b.length > 12 && b(0) == 'R' && b(1) == 'I' &&
    b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
  private def isGvid(b: Array[Byte]) = b.length > 20 && b(0) == 'G' && b(1) == 'V' &&
    b(2) == 'I' && b(3) == 'D'

  /** Decode one blob by sniffing its magic bytes. Dimensions/rates/frames
   * come from the DECODED content (ImageIO pixels, WAV chunk walk), never
   * from the row's metadata columns — which is what makes decode a
   * verification of the payload, not an echo of the schema. */
  def decodeBytes(mediaId: Long, content: Array[Byte]): DecodedMeta = {
    if (isPng(content) || isBmp(content)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, s"undecodable image bytes for mediaId=$mediaId")
      val w = img.getWidth; val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum = sum * 31 + (img.getRGB(x, y) & 0xFFFFFF); x += 1 }
        y += 1
      }
      DecodedMeta(mediaId, "image", if (isPng(content)) "png" else "bmp",
        w, h, -1, 1, content.length, sum)
    } else if (isWav(content)) {
      val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var rate = -1; var bits = -1; var channels = -1
      var dataOff = -1; var dataLen = -1
      // RIFF chunk walk. Chunk order is unconstrained by the spec (data may
      // legally precede fmt), so the walk only records the data chunk's
      // offset; samples are decoded after the walk once fmt is known.
      // Chunks are word-aligned: skip len + (len & 1) so an odd-length
      // chunk doesn't misalign every following tag read.
      def skip(len: Int): Unit =
        bb.position(math.min(bb.position() + len + (len & 1), bb.limit()))
      while (bb.remaining() >= 8 && (rate < 0 || dataOff < 0)) {
        val tag = Array(bb.get(), bb.get(), bb.get(), bb.get()).map(_.toChar).mkString
        val len = bb.getInt()
        // a negative size (corrupt byte flip / >2^31 declared length) would
        // move the position BACKWARD and re-read the same tag forever — fail
        // like every other corrupt-input path instead of hanging the task
        require(len >= 0, s"corrupt RIFF chunk length $len for mediaId=$mediaId")
        if (tag == "fmt ") {
          val p0 = bb.position()
          bb.getShort() // audio format
          channels = bb.getShort()
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          bits = bb.getShort()
          bb.position(p0); skip(len)
        } else if (tag == "data") {
          dataOff = bb.position(); dataLen = math.min(len, bb.remaining())
          skip(len)
        } else skip(len)
      }
      require(rate >= 0 && dataOff >= 0, s"WAV missing fmt/data chunk for mediaId=$mediaId")
      val nSamples = dataLen / math.max(1, (bits / 8) * math.max(1, channels))
      var checksum = 0L
      bb.position(dataOff)
      var i = 0
      while (i < dataLen / 2) { checksum = checksum * 31 + bb.getShort(); i += 1 }
      DecodedMeta(mediaId, "audio", "wav", -1, -1, rate, nSamples, content.length, checksum)
    } else if (isGvid(content)) {
      val bb = java.nio.ByteBuffer.wrap(content)
      bb.position(4)
      val w = bb.getInt(); val h = bb.getInt(); bb.getInt(); val frames = bb.getInt()
      var sum = 0L
      while (bb.hasRemaining) sum = sum * 31 + bb.get()
      DecodedMeta(mediaId, "video", "gvid", w, h, -1, frames, content.length, sum)
    } else throw new IllegalArgumentException(s"unknown media format for mediaId=$mediaId")
  }

  /** Batched decode over partitions — per-partition codec init (ImageIO cache
   * off), no per-row driver work, columnar in/out. */
  def decode(media: Dataset[MediaFile]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp files on executors
      it.map(m => decodeBytes(m.mediaId, m.content))
    }
  }

  /** REAL image resize: decode, scale with bilinear Graphics2D, re-encode
   * PNG. Non-images and already-small images pass through untouched. */
  def resize(media: Dataset[MediaFile], maxDim: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        if (m.kind != "image" || math.max(m.width, m.height) <= maxDim) m
        else {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          val scale = maxDim.toDouble / math.max(src.getWidth, src.getHeight)
          val nw = math.max(1, (src.getWidth * scale).toInt)
          val nh = math.max(1, (src.getHeight * scale).toInt)
          val dst = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, nw, nh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          m.copy(width = nw, height = nh, content = bos.toByteArray)
        }
      }
    }
  }

  /** Frame sampling for video rows: explode to every `stride`-th frame index
   * — pure Catalyst (sequence + explode), the fan-out shape a real frame
   * extractor plugs into. */
  def sampleFrames(media: Dataset[MediaFile], stride: Int): DataFrame =
    media.toDF()
      // frames <= 0 is a legal MediaFile value and must yield ZERO frame
      // rows, not an illegal-sequence-boundaries crash from sequence(0, -1)
      .filter(col("kind") === "video" && col("frames") > 0)
      .select(col("mediaId"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frameIdx"))
}
