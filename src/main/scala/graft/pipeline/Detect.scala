package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Stage 1: chunking + mention detection.
 *
 * Chunking reproduces the reference's overlapping character windows
 * (reference: entityextractor/utils/text_utils.py:89-111, driven by
 * orchestrator.py:38-54) as a pure Catalyst expression chain
 * (sequence + explode + substring) — no UDF, stays inside whole-stage
 * codegen, and "the per-chunk loop" becomes data parallelism: chunks are rows.
 *
 * Mention detection replaces the per-document LLM extraction call
 * (openai_service.py:24-131) with a broadcast Aho-Corasick gazetteer run in
 * mapPartitions (SURVEY.md §2.10) emitting exact document-coordinate offsets
 * (the reference recovers offsets via text.find, orchestrator.py:80-88).
 */
object Detect {

  val DefaultChunkSize = 4000
  val DefaultOverlap = 200

  def docIdCol: org.apache.spark.sql.Column = concat(col("repo"), lit(":"), col("path"))

  /**
   * Overlapping character windows. Semantics: step = size - overlap;
   * chunk i covers [i*step, i*step + size); the last chunk may be short;
   * a document shorter than `size` yields exactly one chunk.
   */
  def chunks(corpus: Dataset[SourceFile], size: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Dataset[Chunk] = {
    // negative overlap would make step > size: characters between chunks
    // would never be scanned — silent mention loss, not an error
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val spark = corpus.sparkSession
    import spark.implicits._
    val step = size - overlap
    corpus
      .withColumn("docId", docIdCol)
      .withColumn("len", length($"content"))
      .withColumn("nChunks",
        when($"len" <= size, lit(1))
          .otherwise(ceil(($"len" - size).cast("double") / step).cast("int") + 1))
      .select($"docId", $"repo", $"path", $"lang", $"content", $"nChunks",
        explode(sequence(lit(0), $"nChunks" - 1)).as("chunkId"))
      .withColumn("chunkStart", $"chunkId" * step)
      .withColumn("chunkText", expr(s"substring(content, chunkStart + 1, $size)"))
      .withColumn("chunkIsLast", $"chunkId" === $"nChunks" - 1)
      .select($"docId", $"repo", $"path", $"lang", $"chunkId", $"chunkStart",
        $"chunkText", $"chunkIsLast")
      .as[Chunk]
  }

  /** Trie pass per chunk; offsets re-based to document coordinates. Narrow
   * (no shuffle): a pure mapPartitions over the chunk rows.
   * @param inferred flag stamped on every mention — explicit for extract
   * mode, implicit for generate mode (generator.py:175 marks every
   * generated entity implicit). */
  def rawMentions(chunks: Dataset[Chunk], gaz: Broadcast[Gazetteer],
      inferred: String = PipelineSchema.InferredExplicit): Dataset[Mention] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val flag = inferred
    chunks.mapPartitions { it =>
      val g = gaz.value
      it.flatMap { c =>
        // interior chunk edges are CUTS, not word boundaries: a cut landing
        // mid-word ("...Spark|le...") must not let the left chunk emit a
        // phantom "spark". A mention suppressed at an interior edge is fully
        // contained — with real context — in the overlapping neighbor chunk
        // (patterns are shorter than the overlap), so recall is unaffected.
        g.findMentions(c.chunkText, atDocStart = c.chunkStart == 0,
            atDocEnd = c.chunkIsLast).map { m =>
          Mention(
            docId = c.docId, repo = c.repo, path = c.path, lang = c.lang,
            chunkId = c.chunkId,
            surface = c.chunkText.substring(m.start, m.end),
            aliasNorm = m.pattern,
            citationStart = c.chunkStart + m.start,
            citationEnd = c.chunkStart + m.end,
            inferred = flag)
        }
      }
    }
  }

  /**
   * Cross-chunk dedup: the overlap region yields the same mention from two
   * adjacent chunks (identical docId+citationStart); keep the earliest chunk
   * (offset-aware "first occurrence wins", mirroring orchestrator.py:56-61).
   */
  def dedupMentions(mentions: Dataset[Mention]): Dataset[Mention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"docId", $"citationStart", $"aliasNorm").orderBy($"chunkId")
    mentions
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn")
      .as[Mention]
  }

  def mentions(corpus: Dataset[SourceFile], gaz: Broadcast[Gazetteer],
      size: Int = DefaultChunkSize, overlap: Int = DefaultOverlap): Dataset[Mention] =
    dedupMentions(rawMentions(chunks(corpus, size, overlap), gaz))
}
