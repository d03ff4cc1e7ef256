package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Training-set assembly operators: token-budget shard packing (a
 * distributed prefix sum) and deterministic stratified sampling (the
 * training-mix filter). Both are pure DataFrame plans — no RNG state, no
 * driver-side loops over data — so results are identical on any cluster
 * layout, which is the property that makes a 100 TB training-data build
 * reproducible.
 */
object PackOps {

  /** Persisted intermediates from [[packShards]] (the binned frame feeds two
   * actions: the per-bin sums and the final windowed pass — without the
   * persist the token-count expression re-runs over the full corpus twice).
   * Same drain contract as [[DedupOps.unpersistIntermediates]]: long-running
   * callers drain between workloads; unpersisting is always safe. */
  private val persistedIntermediates =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private def registerPersisted(df: DataFrame): DataFrame = synchronized {
    persistedIntermediates += df
    df
  }

  def unpersistIntermediates(): Unit = synchronized {
    persistedIntermediates.foreach(_.unpersist(false))
    persistedIntermediates.clear()
  }

  /**
   * Token-budget shard packing ("concat-then-chunk", the standard LLM
   * pretraining layout): documents in stable id order form one logical
   * token stream; each document is assigned to the shard containing its
   * FIRST token — `shard = floor(running_offset / budget)` where
   * `running_offset` = sum of token counts of all earlier docs.
   *
   * The obvious `sum() over (order by id)` is a GLOBAL window: Catalyst
   * plans a single-partition sort — one task owns the whole corpus. This
   * is the textbook distributed prefix-scan instead:
   *
   *   1. ONE sample pass computes balanced id-range boundaries
   *      (`approxQuantile`). The boundaries land in the plan as LITERALS —
   *      re-sampling per action (what `repartitionByRange` does) would let
   *      the two downstream passes see different binnings and corrupt
   *      offsets.
   *   2. ONE aggregate pass bins rows and sums tokens per bin (numBins
   *      rows — dimension-sized) → driver prefix-scan → broadcast
   *      (bin, bin_offset) map.
   *   3. ONE windowed pass per bin (partitionBy bin, orderBy id) adds the
   *      bin offset to the intra-bin running sum.
   *
   * Every shuffle is keyed by bin (numBins balanced groups); per-bin sort
   * memory is corpus/numBins — size numBins to the cluster. Equality with
   * the single-window formulation is pinned in OpsSpecs; the DuckDB oracle
   * for q_pack_shards IS the single-window formulation.
   *
   * @param docs    input frame
   * @param idCol   unique orderable id defining the packing order
   * @param tokens  token-count expression (e.g. [[TextOps.tokenCount]])
   * @param budget  tokens per shard (e.g. a sequence length × batch size)
   * @param numBins parallelism of the scan (≈ partitions of the big pass)
   * @return (idCol, n_tokens, offset, shard) — offset = tokens before this doc
   */
  def packShards(docs: DataFrame, idCol: String, tokens: Column, budget: Long,
      numBins: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    // loud contract, not silent corruption: a non-integral id (e.g. a string
    // key) would cast to NULL for every row and collapse the prefix sum
    docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"packShards requires an integral id column; $idCol is $dt " +
          "(map string keys to a unique long — e.g. a dense rank — first)")
    }
    val base = docs.select(col(idCol).cast("long").as("id"),
      tokens.cast("long").as("n_tokens"))
    val probes = (1 until numBins).map(_.toDouble / numBins).toArray
    val bounds =
      if (numBins <= 1) Array.empty[Double]
      else base.stat.approxQuantile("id", probes, 0.001).distinct.sorted
    // bin = #boundaries <= id: monotone in id, so bin ranges are ordered;
    // persisted because it feeds two actions (per-bin sums + windowed pass)
    val binned = registerPersisted(base.withColumn("bin",
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.toSeq.map(b => lit(b.toLong)): _*),
        b => b <= col("id")))).persist())
    val perBin = binned.groupBy("bin").agg(sum("n_tokens").as("btok"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = perBin.map { case (b, t) => val o = (b, acc); acc += t; o }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("bin", "bin_offset")
    // explicit ROWS frame: the default RANGE frame makes equal-id rows
    // PEERS (each would see the whole group's sum); ids are unique by
    // contract, but ROWS keeps a duplicate-id mistake a per-row running
    // sum instead of a silent double-count
    val w = Window.partitionBy("bin").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.join(broadcast(offDf), Seq("bin"))
      .withColumn("offset", col("bin_offset") + sum("n_tokens").over(w) - col("n_tokens"))
      // integer `div`, not floor(x / y): double division loses exactness
      // past 2^53 total tokens, a reachable offset at the 100 TB target
      .withColumn("shard", expr(s"offset div ${budget}L"))
      .select(col("id").as(idCol), col("n_tokens"), col("offset"), col("shard"))
  }

  /**
   * Deterministic stratified sampling by hash threshold: keep a row iff
   * `portableHash32(id) mod 10000 < rateBp(stratum)` — the training-mix
   * rebalancer (down-weight over-represented languages/sources). The
   * decision is a pure per-row predicate on a content-stable hash:
   * no shuffle, no RNG, identical on every run, every cluster layout, and
   * every engine (md5 basis — DuckDB recomputes the exact same sample).
   * `df.sample`, by contrast, draws from a partition-seeded RNG: adding
   * one executor changes the sample.
   *
   * Rates are integer BASIS POINTS per 10,000 (not doubles: 0.3 * 10000
   * is 2999.999… in binary and engines disagree on the cast).
   *
   * @param ratesBp   per-stratum keep-threshold out of 10,000
   * @param defaultBp threshold for strata not in the map
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, bp)) =>
      when(col(stratumCol) === k, lit(bp)).otherwise(acc)
    }
    df.filter(
      pmod(TextOps.portableHash32(col(idCol).cast("string")), lit(10000L)) < rate)
  }
}
