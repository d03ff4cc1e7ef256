package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._

/**
 * CLI entry mirroring the reference's main (reference: entityextractor/main.py:84-158):
 * generate/read a corpus, run the full KG pipeline, write triple/entity/lineage
 * tables, print the statistics block.
 *
 * Usage: runMain graft.Run [numFiles] [outDir] [cores]
 */
object Run {
  def main(args: Array[String]): Unit = {
    val numFiles = args.headOption.map(_.toLong).getOrElse(2000L)
    val outDir = args.lift(1).getOrElse("/tmp/graft-out")
    val cores = args.lift(2).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val corpus = Corpus.generate(spark, numFiles, numRepos = 200, seed = 42L,
      partitions = cores.toInt * 2).persist()
    val nDocs = corpus.count()

    val result = Pipeline.run(spark, corpus)
    Materialize.writeStage(result.canonicalTriples.toDF(), "triples", outDir, resume = false)
    val nTriples = result.triples.count()
    val elapsed = (System.nanoTime() - t0) / 1e9

    println(s"== graft KG pipeline ==")
    println(f"docs=$nDocs triples=$nTriples elapsed=$elapsed%.2fs " +
      f"files/sec=${nDocs / elapsed}%.1f triples/sec=${nTriples / elapsed}%.1f")
    println("-- types_distribution --")
    Stats.typesDistribution(result.docEntities).show(20, false)
    println("-- linked share --")
    Stats.linkedShare(result.docEntities).show(false)
    println("-- top categories --")
    Stats.topCategories(result.linked).show(false)
    println("-- entity_connections (top 10) --")
    Stats.entityConnections(result.triples).show(10, false)
    spark.stop()
  }
}
