package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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

  /** MapType cannot feed `hash()` (analysis error: unhashable); structs and
   * arrays can unless they CONTAIN a map. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  /**
   * Retry-safe per-row salt: a pure function of the row's hashable columns
   * PLUS the physical partition id. Either alone is insufficient:
   *  - row-hash only: byte-identical duplicate rows (common in count-by-key
   *    inputs with few columns) all land in one bucket, silently re-creating
   *    the skew the salt exists to break;
   *  - partition id only: one giant scan partition of the hot key still maps
   *    to one bucket.
   * `spark_partition_id()` is stable under task retry — scan partitions are
   * deterministic file splits and shuffle partition assignment is a pure
   * function of the key — unlike `monotonically_increasing_id`/`rand`, whose
   * values depend on nondeterministic intra-partition row order. Identical
   * rows WITHIN one partition still share a salt, but those collapse in that
   * task's map-side partial aggregate before the shuffle, so no reducer ever
   * sees them as volume.
   */
  private[graft] def rowSalt(df: DataFrame, saltBuckets: Int): Column = {
    val cols = df.schema.fields.withFilter(f => hashable(f.dataType)).map(f => col(f.name))
    pmod(hash((cols :+ spark_partition_id()): _*), lit(saltBuckets))
  }

  /**
   * Two-phase salted count-style aggregation: phase 1 aggregates on
   * (key, salt) — spreading a hot key over `saltBuckets` reducers — phase 2
   * merges the partials per key. Correct for any ASSOCIATIVE aggregate
   * supplied as (partialAgg, mergeAgg) column pairs over the same name.
   */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, saltBuckets))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_partial").as("cnt"))
  }

  /** Skew-safe distinct-count: phase 1 dedups on (key, value) — the value
   * in the grouping key spreads a hot key across reducers WITHOUT an
   * explicit salt (the composite is already high-cardinality, so a salt
   * column would add shuffle width for nothing) — phase 2 counts the
   * pre-shrunk rows per key. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
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
    // same retry-safe construction as saltedCount (rowSalt doc)
    val saltedProbe = probe.withColumn("_salt", rowSalt(probe, saltBuckets))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
