package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline._

/**
 * Structured Streaming wrappers (SURVEY.md §2.9). The reference is strictly
 * batch (one synchronous call per text, orchestrator.py:26-35); these give
 * incremental ingest of the SAME stage functions without inventing new
 * semantics: a streaming source feeds `foreachBatch`, each micro-batch runs
 * the identical batch pipeline. Event-time windowed aggregation with a
 * watermark is provided for the events stream.
 */
object StreamingOps {

  /** Tumbling 1-hour event-time aggregation — usable identically over a
   * batch DataFrame or a stream (with watermark applied by the caller). */
  def windowedEventStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** File-based corpus stream: each new parquet file under `dir` becomes a
   * micro-batch. Schema must be supplied (streaming requirement). */
  def corpusStream(spark: SparkSession, dir: String): Dataset[SourceFile] = {
    import spark.implicits._
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SourceFile]].schema)
      .parquet(dir)
      .as[SourceFile]
  }

  /**
   * Incremental KG construction: per micro-batch run detect→link→relate→dedup
   * and append the batch's triples to `outDir/triples_stream`. Cross-batch
   * exact dedup happens on read (the same Dedup.exact window) — append-only
   * storage plus dedup-on-read is the streaming-safe equivalent of the batch
   * dedup chain.
   */
  def incrementalKg(spark: SparkSession, stream: Dataset[SourceFile], outDir: String,
      cfg: PipelineConfig = PipelineConfig()): StreamingQuery = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: Dataset[SourceFile], batchId: Long) =>
        if (!batch.isEmpty) {
          val result = Pipeline.run(spark, batch, cfg)
          result.triples.write.mode("append").parquet(s"$outDir/triples_stream")
        }
        ()
      }
      .start()
  }

  /** Read-side dedup for the append-only stream output. Exact (s,p,o) dedup
   * and equality-keyed pair consolidation are min-selections under total
   * orders — associative, so batched-then-merged equals global. The FUZZY
   * predicate clustering is greedy and therefore associative only when
   * similarity is effectively transitive within a pair's predicates; that
   * holds on the pipeline's closed predicate vocabulary (clusters are
   * singletons or tight spelling variants), and StreamingSpec asserts
   * stream == batch end-to-end. On an open vocabulary, run the final fuzzy
   * pass over the merged stream output only (it is idempotent), not
   * per-batch. */
  def readStreamTriples(spark: SparkSession, outDir: String): Dataset[Triple] = {
    import spark.implicits._
    Dedup.all(spark.read.parquet(s"$outDir/triples_stream").as[Triple])
  }
}
