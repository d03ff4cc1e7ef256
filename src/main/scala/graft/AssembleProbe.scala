package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Scale probe for the training-set assembly operators (PackOps / AsofJoin):
 * deterministic synthetic inputs from `spark.range` id arithmetic (no
 * external data), timings as one JSON line per measurement.
 *
 * - pack_distributed vs pack_single_window: the 3-pass distributed
 *   prefix-scan against the textbook `sum() over (order by id)` global
 *   window (which Catalyst plans as a SINGLE-partition sort — the thing
 *   packShards exists to avoid). Both produce identical results
 *   (PackOpsSpec); this measures the wall-clock gap at multi-million-row
 *   scale and local[N] width.
 * - asof_join: union+window point-in-time join throughput at a 90/10
 *   right/left split over many keys.
 *
 * Usage: runMain graft.AssembleProbe [nDocs] [nEvents] [reps]
 */
object AssembleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nEvents = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-assemble-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(label: String, rows: Long)(f: => Unit): Unit = {
      // drain packShards' persisted binned frame between reps: the cache
      // matches by canonicalized plan, so rep 2 would otherwise skip the
      // scan entirely and report a warm-cache number as if it were cold
      val ts = (1 to reps).map { _ =>
        graft.ops.PackOps.unpersistIntermediates(); time(f)
      }
      println(f"""{"probe":"$label","rows":$rows,"best_s":${ts.min}%.2f,"reps":[${ts.map(t => f"$t%.2f").mkString(",")}],"rows_per_sec":${rows / ts.min}%.0f,"cores":$cpus}""")
    }

    // ---- packShards: skewed token counts over gapped shuffled-ish ids ----
    val docs = spark.range(0L, nDocs, 1L, 64)
      .select((col("id") * 7L).as("doc_id"),
        (lit(50) + pmod(hash(col("id")), lit(950))).as("n_tok"))
    best("pack_distributed", nDocs) {
      graft.ops.PackOps.packShards(docs, "doc_id", col("n_tok"),
        budget = 1000000L, numBins = 256)
        .write.format("noop").mode("overwrite").save()
    }
    best("pack_single_window", nDocs) {
      val w = Window.orderBy("doc_id")
      docs.withColumn("offset", sum("n_tok").over(w) - col("n_tok"))
        .withColumn("shard", expr("offset div 1000000L"))
        .write.format("noop").mode("overwrite").save()
    }

    // ---- asof: 90% right rows, 10% left probes, 1M keys ----
    val ev = spark.range(0L, nEvents, 1L, 64).select(
      col("id").as("event_id"),
      pmod(hash(col("id")), lit(1000000)).as("user_id"),
      timestamp_seconds(lit(1600000000L) + pmod(hash(col("id"), lit(1)), lit(86400 * 30))).as("ts"),
      (pmod(hash(col("id"), lit(2)), lit(1000)) / 10.0).as("value"))
    val left = ev.filter(pmod(col("event_id"), lit(10)) === 0)
    val right = ev.filter(pmod(col("event_id"), lit(10)) =!= 0)
    best("asof_join", nEvents) {
      graft.ops.AsofJoin.asof(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
