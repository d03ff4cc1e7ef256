package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of suspicious costs. */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"  $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("scan+count") { docs.count() }
    time("md5 only") {
      docs.select(md5(col("text")).as("m")).write.format("noop").mode("overwrite").save()
    }
    time("fingerprint") {
      docs.select(graft.ops.TextOps.fingerprint(col("text")).as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    time("fp groupBy") {
      docs.select(col("doc_id"), graft.ops.TextOps.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id")).write.format("noop").mode("overwrite").save()
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("lineitem count") { li.count() }
    time("li groupBy countDistinct") {
      li.select(concat(lit("p"), col("l_partkey")).as("node"), concat(lit("s"), col("l_suppkey")).as("nbr"))
        .groupBy("node").agg(countDistinct("nbr")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
