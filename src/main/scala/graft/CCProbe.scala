package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Isolate the identity-edge distinct cost. Usage: runMain graft.CCProbe [nFiles] */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(100000L)
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
      val t0 = System.nanoTime(); val r = f
      println(f"  [probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus = Corpus.generate(spark, nFiles, 200, 42L, cpus.toInt * 2).persist()
    corpus.count()
    val gaz = spark.sparkContext.broadcast(Gazetteer.fromKb())
    val linked = Link.link(Detect.mentions(corpus, gaz), KB.labels(spark)).persist()
    time("linked count")(linked.count())
    time("scan only: count non-null qid")(linked.filter($"qid".isNotNull).count())
    time("project concat no distinct")(
      linked.filter($"qid".isNotNull)
        .select(concat(lit("n:"), lower($"entityName")), concat(lit("q:"), $"qid")).count())
    time("select 2 cols distinct")(
      linked.select($"entityName", $"qid").distinct().count())
    time("project concat + distinct")(
      linked.filter($"qid".isNotNull)
        .select(concat(lit("n:"), lower($"entityName")).as("src"), concat(lit("q:"), $"qid").as("dst"))
        .distinct().count())
    time("repeat distinct (warm)")(
      linked.filter($"qid".isNotNull)
        .select(concat(lit("n:"), lower($"entityName")).as("src"), concat(lit("q:"), $"qid").as("dst"))
        .distinct().count())
    spark.stop()
  }
}
