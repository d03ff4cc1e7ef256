package graft

import org.apache.spark.sql.SparkSession

/**
 * Cluster-size scaling evidence (north_rule): the same KG pipeline job on the
 * same input at two parallelism levels — local[N] and local[4N] cores — with
 * throughput at both and the scaling efficiency (T_N / T_4N) / 4.
 *
 * A real cluster is not available in this sandbox; per BASELINE.md the N vs
 * 4N executor comparison is evidenced as N vs 4N local cores. Sessions are
 * created and fully stopped sequentially in one JVM; a warm-up run at the
 * small level absorbs JIT/codegen costs so both measured runs are warm.
 *
 * Usage: runMain graft.ScaleBench [nFiles] [N] [reps] [kbSize]
 * (kbSize 0 = toy KB + sparse corpus; > 0 = SyntheticKb + dense corpus)
 */
object ScaleBench {

  def timedRun(cores: Int, nFiles: Long, warmup: Boolean,
      kbSize: Long = 0L): (Double, Long, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scale-$cores")
      // default: one shuffle partition per core; GRAFT_SHUFFLE_PARTS
      // overrides for straggler-smoothing experiments at full host width
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", cores.toString))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      // local-scale knobs (cluster defaults are right at real data sizes):
      // our rows are small but CPU-heavy, so 64MB-target AQE coalescing and
      // 128MB scan splits would leave most cores idle
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // task-memory pages default to 64MB long[] — humongous for G1 regions,
      // measured as continuous concurrent GC + fragmentation across reps
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (warmup) Bench.runPipelineBench(spark, math.max(500L, nFiles / 20), kbSize)
      Bench.runPipelineBench(spark, nFiles, kbSize)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(20000L)
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val kbSize = args.lift(3).map(_.toLong).getOrElse(0L)
    // the sandbox VM's available cycles drift over minutes (host
    // throttling); interleave the two levels and take per-level BEST so a
    // throttled window cannot poison one side of the comparison
    var bestN = Double.MaxValue
    var best4N = Double.MaxValue
    var docsN = 0L
    var triplesN = 0L
    (0 until reps).foreach { r =>
      val (tN, dN, tr) = timedRun(n, nFiles, warmup = r == 0, kbSize)
      val (t4N, d4N, _) = timedRun(n * 4, nFiles, warmup = r == 0, kbSize)
      require(dN == d4N)
      docsN = dN; triplesN = tr
      bestN = math.min(bestN, tN); best4N = math.min(best4N, t4N)
      System.err.println(f"[scale] rep $r: t$n=$tN%.2f t${n * 4}=$t4N%.2f")
    }
    val efficiency = (bestN / best4N) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","n_cores":$n,"t_n_sec":$bestN%.2f,"files_per_sec_n":${docsN / bestN}%.1f,"n4_cores":${n * 4},"t_4n_sec":$best4N%.2f,"files_per_sec_4n":${docsN / best4N}%.1f,"files":$nFiles,"triples":$triplesN,"kb_size":$kbSize,"reps":$reps,"aggregation":"best-per-level (interleaved; host-throttling noise)"}""")
  }
}

/**
 * Single-level variant for OS-pinned measurement: run under
 * `taskset -c 0..N-1` so the WHOLE JVM (task threads, GC, shuffle IO,
 * codegen) sees exactly N cores — local[N] alone still lets GC/IO spill
 * onto other host cores and flatters the small level.
 *
 * Every leg APPENDS one machine-readable JSON line (cores, per-rep walls,
 * best, files/sec, corpus + KB parameters, epoch timestamps) to
 * $GRAFT_SCALING_JSON (default /root/repo/BENCH_scaling.json) — the
 * round-3 VERDICT asked for the pinned methodology to be verifiable from
 * artifacts, not only from BASELINE.md prose. Pair legs offline into an
 * efficiency figure.
 *
 * Usage: runMain graft.ScaleBenchOne <nFiles> <cores> [reps] [kbSize]
 */
object ScaleBenchOne {
  def main(args: Array[String]): Unit = {
    val nFiles = args(0).toLong
    val cores = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val kbSize = args.lift(3).map(_.toLong).getOrElse(0L)
    val t0Epoch = System.currentTimeMillis()
    var best = Double.MaxValue
    var docs = 0L; var triples = 0L
    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    (0 until reps).foreach { r =>
      val (t, d, tr) = ScaleBench.timedRun(cores, nFiles, warmup = r == 0, kbSize)
      best = math.min(best, t); docs = d; triples = tr
      walls += t
      System.err.println(f"[scale-one] cores=$cores rep=$r t=$t%.2f")
    }
    val bcast = Bench.broadcastDimsFromEnv // the parse that took effect in the run
    val line =
      f"""{"metric":"pipeline_time","cores":$cores,"sec":$best%.2f,"reps":${walls.map(w => f"$w%.2f").mkString("[", ",", "]")},"files_per_sec":${docs / best}%.1f,"files":$nFiles,"triples":$triples,"kb_size":$kbSize,"broadcast_dims":$bcast,"availableProcessors":${Runtime.getRuntime.availableProcessors},"startedEpochMs":$t0Epoch,"endedEpochMs":${System.currentTimeMillis()}}"""
    println(line)
    val out = sys.env.getOrElse("GRAFT_SCALING_JSON", "/root/repo/BENCH_scaling.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
