package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._

/** Stage-level wall-clock breakdown of the KG pipeline.
 * Usage: runMain graft.PipelineProfile [nFiles] */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpus = Corpus.generate(spark, nFiles, 200, 42L, cpus.toInt * 2).persist()
    time("corpus gen+count")(corpus.count())

    val gaz = spark.sparkContext.broadcast(Gazetteer.fromKb())
    val labels = KB.labels(spark)
    val wikidata = KB.wikidata(spark)
    val dbpedia = KB.dbpedia(spark)

    val mentions = Detect.mentions(corpus, gaz)
    val linked = Link.link(mentions, labels).persist()
    time("detect+link")(linked.count())

    val docEntities = Link.docEntities(linked).persist()
    time("docEntities")(docEntities.count())

    val rawTriples = Relate.triples(docEntities, wikidata)
    val deduped = Dedup.fuzzy(Dedup.consolidatePairs(Dedup.exact(rawTriples))).persist()
    time("relate+dedup")(deduped.count())

    time("identityEdges count")(Canonicalize.identityEdges(linked, dbpedia).count())
    time("identityEdges count again")(Canonicalize.identityEdges(linked, dbpedia).count())
    val canonMap = time("canonicalize (CC)")(Canonicalize.canonicalMap(linked, dbpedia).persist())
    time("canonMap count")(canonMap.count())

    val canonical = Canonicalize.canonicalTriples(deduped, canonMap)
    time("canonical triples noop write") {
      canonical.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
