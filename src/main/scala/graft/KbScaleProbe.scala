package graft

import org.apache.spark.sql.SparkSession

/**
 * KB-dimension scale probe (round-4 evidence, BASELINE.md): for a given
 * SyntheticKb size, measure what the toy fixtures never could — gazetteer
 * automaton build time / state count / shipped bytes / dense-DFA
 * eligibility / match throughput, and the broadcast build-side size of the
 * per-alias link argmax. These are the numbers behind the documented
 * broadcast→shuffle cutover and the dense→sparse DFA cutover.
 *
 * Usage: runMain graft.KbScaleProbe [kbSize ...]  (default 100000 750000)
 */
object KbScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(100000L, 750000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { m =>
      val t0 = System.nanoTime()
      val gaz = graft.pipeline.SyntheticKb.gazetteer(m)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val denseEligible = gaz.nStates <= graft.pipeline.Gazetteer.DenseMaxStates
      val denseBytes = if (denseEligible) gaz.nStates.toLong * 128 * 4 else 0L
      // match throughput over a synthetic 100-doc corpus slice
      val docs = (0 until 100).map { k =>
        val r = new scala.util.Random(k)
        (0 until 400).map { _ =>
          val i = (r.nextDouble() * m).toLong
          if (r.nextInt(4) == 0) graft.pipeline.SyntheticKb.title(i)
          else s"word${r.nextInt(5000)}"
        }.mkString(" ")
      }
      val totalChars = docs.map(_.length.toLong).sum
      docs.foreach(d => gaz.findMentions(d)) // warm (+ dense build if eligible)
      val t1 = System.nanoTime()
      var mentions = 0L
      docs.foreach(d => mentions += gaz.findMentions(d).size)
      val matchSec = (System.nanoTime() - t1) / 1e9
      // per-run gazetteer broadcast ship (what KbDims.gazetteerBroadcast
      // amortizes to once per session): serialize + register the CSR arrays
      // and force task-side access, vs re-touching the session-cached handle
      val tb0 = System.nanoTime()
      val bc = spark.sparkContext.broadcast(gaz)
      spark.sparkContext.parallelize(0 until 8, 8).map(_ => bc.value.nStates).count()
      val shipSec = (System.nanoTime() - tb0) / 1e9
      val tb1 = System.nanoTime()
      spark.sparkContext.parallelize(0 until 8, 8).map(_ => bc.value.nStates).count()
      val reuseSec = (System.nanoTime() - tb1) / 1e9
      bc.destroy()
      // broadcast build side of the link join
      val labels = graft.pipeline.SyntheticKb.labels(spark, m)
      val t2 = System.nanoTime()
      val dimRows = graft.pipeline.Link.bestPerAlias(labels).collect()
      val dimBuildSec = (System.nanoTime() - t2) / 1e9
      val dimBytes = org.apache.spark.util.SizeEstimator.estimate(dimRows)
      println(
        f"""{"metric":"kb_scale_probe","kb_size":$m,"aliases":${gaz.patterns.length},"gaz_build_sec":$buildSec%.2f,"gaz_states":${gaz.nStates},"gaz_sparse_bytes":${gaz.sparseBytes},"dense_eligible":$denseEligible,"dense_bytes":$denseBytes,"match_mb_per_sec":${totalChars / 1e6 / matchSec}%.1f,"mentions":$mentions,"gaz_broadcast_ship_sec":$shipSec%.2f,"gaz_broadcast_reuse_sec":$reuseSec%.2f,"link_dim_rows":${dimRows.length},"link_dim_bytes":$dimBytes,"link_dim_build_sec":$dimBuildSec%.2f}""")
    }
    spark.stop()
  }
}
