package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.ConcurrentHashMap

/** Find which stages eat the wall-clock at a given parallelism.
 * Usage: runMain graft.StallHunt [nFiles] [cores] [reps] */
object StallHunt {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(100000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // local-scale knobs (cluster defaults are right at real data sizes):
      // our rows are small but CPU-heavy, so 64MB-target AQE coalescing and
      // 128MB scan splits would leave most cores idle
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // task-memory pages default to 64MB long[] — humongous for G1 regions,
      // measured as continuous concurrent GC + fragmentation across reps
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val slow = new ConcurrentHashMap[Int, (Long, String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (dur > 2000) {
          val gc = si.taskMetrics.jvmGCTime
          slow.put(si.stageId, (dur, si.name.take(80), si.numTasks, gc))
        }
      }
    })

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val (dt, docs, _) = Bench.runPipelineBench(spark, nFiles)
      println(f"  [hunt] rep $i pipeline=$dt%.2f s (${docs / dt}%.0f files/s)")
    }
    println("  [hunt] slow stages (>2s): id, wallMs, gcMs, tasks, name")
    import scala.jdk.CollectionConverters._
    slow.asScala.toSeq.sortBy(-_._2._1).take(15).foreach { case (id, (dur, name, nt, gc)) =>
      println(f"  [hunt] stage $id%5d ${dur}%7d ms gc=${gc}%6d ms tasks=$nt%3d $name")
    }
    spark.stop()
  }
}
