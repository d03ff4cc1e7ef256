package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline._

class StreamingSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  test("streaming windowed aggregation equals the batch result") {
    // watermarks require TIMESTAMP (with tz); driver parquet ships TIMESTAMP_NTZ
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
    val batch = StreamingOps.windowedEventStats(events)
      .collect().map(_.toSeq).toSet

    val tmp = java.nio.file.Files.createTempDirectory("graft-evt").toString
    events.write.mode("overwrite").parquet(tmp)
    val s2 = spark.readStream.schema(events.schema).parquet(tmp)
    val q = StreamingOps.windowedEventStats(s2.withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("evt_agg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("evt_agg").collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("incremental KG over micro-batches equals the batch pipeline triples") {
    val corpus = Corpus.generate(spark, 120L, numRepos = 10, seed = 42L, partitions = 4)
    val batchTriples = Pipeline.run(spark, corpus).triples
      .select("subject", "predicate", "obj", "inferred").collect().map(_.toSeq).toSet

    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    // two separate files -> two micro-batches
    corpus.filter($"path".substr(-4, 4) =!= ".py").write.mode("append").parquet(inDir)
    corpus.filter($"path".substr(-4, 4) === ".py").write.mode("append").parquet(inDir)

    val q = StreamingOps.incrementalKg(spark,
      StreamingOps.corpusStream(spark, inDir), outDir)
    q.awaitTermination(120000)

    val streamed = StreamingOps.readStreamTriples(spark, outDir)
      .select("subject", "predicate", "obj", "inferred").collect().map(_.toSeq).toSet
    // per-batch relate only sees its own docs; cross-batch dedup on read.
    // The batch run's pair-consolidation is global, so the streamed set must
    // be a superset of the batch set at equal explicit/implicit semantics —
    // for this corpus the plants are per-doc, so sets match exactly.
    assert(streamed == batchTriples)
  }
}
