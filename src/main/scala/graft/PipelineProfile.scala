package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/**
 * Stage-level wall-clock breakdown of the EXACT `Bench.runPipelineBench`
 * phases (same session config, same corpus, same action order) — the tool
 * for localizing scaling-efficiency regressions: run it pinned at two core
 * counts and diff the per-stage times; a stage whose time does not shrink
 * with cores is the serial fraction.
 *
 * Usage: [taskset -c ...] runMain graft.PipelineProfile [nFiles] [reps]
 * with SPARK_GRAFT_CPUS=N.
 */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(100000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpus = Corpus.materialize(spark, s"/tmp/graft-corpus-$nFiles", nFiles,
      numRepos = 200, seed = 42L, partitions = spark.sparkContext.defaultParallelism * 2)
    time("corpus count")(corpus.count())

    // GRAFT_FINE=1: decompose detect+link into sub-stages (each action
    // re-runs the prefix, so read DELTAS between lines, not absolutes)
    if (sys.env.contains("GRAFT_FINE")) {
      val cfg = PipelineConfig()
      val gaz = spark.sparkContext.broadcast(Gazetteer.fromKb(cfg.language))
      val labels = KB.labelsForLang(spark, cfg.language)
      (0 until reps).foreach { rep =>
        println(s"== fine rep $rep (cores=$cpus files=$nFiles) ==")
        time("scan only (sum content length)")(
          corpus.select(sum(length(col("content")))).head())
        val ch = Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap)
        time("chunks (count)")(ch.count())
        val raw = Detect.rawMentions(ch, gaz)
        time("chunks+trie rawMentions (count)")(raw.count())
        time("… + distinct (count)")(raw.drop("chunkId").distinct().count())
        val linked = Link.link(raw, labels)
        time("… + broadcast link (count)")(linked.count())
        time("… + docEntities groupBy (count)")(Link.docEntities(linked).count())
      }
      spark.stop()
      return
    }

    (0 until reps).foreach { rep =>
      println(s"== rep $rep (cores=$cpus files=$nFiles) ==")
      val cfg = PipelineConfig()
      val gaz = time("gazetteer build+broadcast")(
        spark.sparkContext.broadcast(Gazetteer.fromKb(cfg.language)))
      val labels = KB.labelsForLang(spark, cfg.language)
      val wikidata = KB.wikidata(spark)
      val dbpedia = KB.dbpedia(spark)
      val mentions = Detect.rawMentions(
        Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap), gaz)
      val linked = Link.link(mentions, labels).persist()
      val docEntities = Link.docEntities(linked).persist()
      time("detect+link+docEntities (count)")(docEntities.count())
      val rawTriples = Relate.triples(docEntities, wikidata)
      val deduped = Dedup.consolidatePairs(Dedup.exact(rawTriples), fuzzy = cfg.runFuzzyDedup)
        .persist()
      val canonMap = time("canonicalMapFromKb localCheckpoint")(
        Canonicalize.canonicalMapFromKb(labels, dbpedia,
          Some(KB.dbpediaLookup(spark))).localCheckpoint(true))
      val canonical = Canonicalize.canonicalTriples(deduped, canonMap)
      time("relate+dedup+canonical (noop write)")(
        canonical.write.format("noop").mode("overwrite").save())
      time("triples count (cached)")(deduped.count())
      linked.unpersist()
      docEntities.unpersist()
      deduped.unpersist()
    }
    spark.stop()
  }
}
