package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-6 optimization harness (guide §1): NOT part of the driver contract —
 * Bench.scala stays the measured main. This one exists so single queries can
 * be isolated (noop sink, §1.4), timed across more reps, and their
 * `.explain("formatted")` captured for plans/r06/ without paying the full
 * bench.
 *
 * Usage:
 *   runMain graft.BenchExtra time <reps> <query...>      — warm + reps, JSON out
 *   runMain graft.BenchExtra explain <outDir> <query...> — formatted plans
 * <query...> empty = all queries.
 */
object BenchExtra {

  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = args.headOption.getOrElse("time")
    val spark = session()
    mode match {
      case "time" =>
        val reps = args.lift(1).map(_.toInt).getOrElse(3)
        val names = if (args.length > 2) args.drop(2).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        val out = names.map { name =>
          val fn = SparkEntry.queries(name)
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          spark.sparkContext.setJobDescription(s"warm:$name")
          once() // warm: codegen + JIT
          val times = (1 to reps).map { i =>
            spark.sparkContext.setJobDescription(s"rep$i:$name")
            once()
          }
          name -> times
        }
        val js = out.map { case (n, ts) =>
          "\"" + n + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
        }.mkString("{", ",", "}")
        println(s"BENCHX $js")
      case "explain" =>
        val outDir = args(1)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val names = if (args.length > 2) args.drop(2).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), txt.getBytes("UTF-8"))
          println(s"explained $name")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
