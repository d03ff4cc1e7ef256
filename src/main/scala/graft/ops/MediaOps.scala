package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / resize / frame-sample
 * operators.
 *
 * The Spark-side contract (schema, partition behavior, batched per-partition
 * processing) is real and tested; the actual codec step is a STUB — a
 * deterministic fake decoder over a self-describing synthetic header
 * (media libs are not available in this environment). Swapping in a real
 * codec changes only the body of `decodeBytes`.
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
      width: Int,
      height: Int,
      sampleRate: Int,
      frames: Int,
      byteLen: Int,
      checksum: Long)

  /** Deterministic synthetic media blob: 16-byte header (kind, w, h, rate,
   * frames as ints) + pseudo-random payload derived from the id. */
  def fakeBlob(id: Long, kind: String, w: Int, h: Int, rate: Int, frames: Int): Array[Byte] = {
    val payloadLen = 256 + (id % 512).toInt
    val bb = java.nio.ByteBuffer.allocate(20 + payloadLen)
    bb.putInt(kind.hashCode).putInt(w).putInt(h).putInt(rate).putInt(frames)
    var x = id * 6364136223846793005L + 1442695040888963407L
    (0 until payloadLen).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte
      )
    }
    bb.array()
  }

  /** Synthetic media table, generated distributed. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      kind match {
        case "image" =>
          val w = 64 + (id % 8).toInt * 32; val h = 48 + (id % 5).toInt * 32
          MediaFile(id, kind, fakeBlob(id, kind, w, h, -1, 1), w, h, -1, 1)
        case "audio" =>
          val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
          MediaFile(id, kind, fakeBlob(id, kind, -1, -1, rate, -1), -1, -1, rate, -1)
        case _ =>
          val fr = 24 + (id % 4).toInt * 6
          MediaFile(id, kind, fakeBlob(id, kind, 320, 240, -1, fr), 320, 240, -1, fr)
      }
    }
  }

  /** STUB decode: parses the synthetic header + checksums the payload.
   * A real implementation would call an image/audio codec here; signature,
   * batching, and schema stay identical. */
  def decodeBytes(mediaId: Long, kind: String, content: Array[Byte]): DecodedMeta = {
    val bb = java.nio.ByteBuffer.wrap(content)
    bb.getInt() // kind hash (ignored by the stub)
    val w = bb.getInt(); val h = bb.getInt(); val rate = bb.getInt(); val frames = bb.getInt()
    var sum = 0L
    while (bb.hasRemaining) sum = sum * 31 + bb.get()
    DecodedMeta(mediaId, kind, w, h, rate, frames, content.length, sum)
  }

  /** Batched decode over partitions — the distributed shape a real codec
   * needs (per-partition init cost amortized, no per-row driver work). */
  def decode(media: Dataset[MediaFile]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a real codec context
      it.map(m => decodeBytes(m.mediaId, m.kind, m.content))
    }
  }

  /** STUB resize: recomputes header dims; payload untouched (a real impl
   * would transcode). Returns the same schema — pipeline-composable. */
  def resize(media: Dataset[MediaFile], maxDim: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.width, m.height) <= maxDim) m
      else {
        val scale = maxDim.toDouble / math.max(m.width, m.height)
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        m.copy(width = nw, height = nh, content = fakeBlob(m.mediaId, m.kind, nw, nh, -1, 1))
      }
    }
  }

  /** Frame sampling for video rows: explode to every `stride`-th frame index
   * — pure Catalyst (sequence + explode), the fan-out shape a real frame
   * extractor plugs into. */
  def sampleFrames(media: Dataset[MediaFile], stride: Int): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("mediaId"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frameIdx"))
}
