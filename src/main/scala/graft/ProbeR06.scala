package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition probe for round-6 optimization (not a bench). */
object ProbeR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchExtra.session()
    import graft.ops._

    if (args.headOption.contains("pipeline")) {
      // phase-timed pipeline legs (set GRAFT_STAGE_TIMES=1 for the split)
      val nFiles = args.lift(1).map(_.toLong).getOrElse(100000L)
      val kb = args.lift(2).map(_.toLong).getOrElse(0L)
      val reps = args.lift(3).map(_.toInt).getOrElse(2)
      (1 to reps).foreach { i =>
        val (dt, nd, nt) = Bench.runPipelineBench(spark, nFiles, kb)
        println(f"  [pipe] rep$i kb=$kb files=$nd triples=$nt: $dt%.2f s")
      }
      spark.stop(); return
    }

    def time[T](label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"  [probe] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs scan")(noop(docs))
    time("docs explode 5-grams (no distinct)")(noop(
      docs.select(col("doc_id").as("id"),
        explode(when(size(TextOps.tokens(col("text"))) >= 5,
          transform(sequence(lit(0), size(TextOps.tokens(col("text"))) - 5),
            i => concat_ws("", slice(TextOps.tokens(col("text")), i + 1, lit(5)))))
          .otherwise(array().cast("array<string>"))).as("shingle"))))
    time("shingles(docs,5) incl distinct")(noop(DedupOps.shingles(docs, 5)))
    val docsR = docs.repartition(32)
    time("shingles over pre-repartitioned docs")(noop(DedupOps.shingles(docsR, 5)))
    time("contamination full")(noop(DedupOps.contamination(docs,
      docs.filter(col("doc_id") % 50 === 0), n = 5, minHits = 2)))
    time("contamination pre-repartitioned")(noop(DedupOps.contamination(docsR,
      docsR.filter(col("doc_id") % 50 === 0), n = 5, minHits = 2)))
    spark.stop()
  }
}
