package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of (point-in-time) join: for every left row, attach the latest right
 * row with `right.ts <= left.ts` on the same key — feature-store lookups,
 * slowly-changing dimensions, "price as of trade time". The reference's
 * pipeline has no temporal joins (its events are single documents), but a
 * 100 TB training-data pipeline joining interaction logs to snapshot
 * features needs exactly this, and Spark ships no native as-of operator.
 *
 * Naive formulations fail at scale: a range θ-join plans
 * BroadcastNestedLoopJoin (O(|L|·|R|) pair space), and a per-left-row
 * max-ts subquery costs an extra aggregate + equi-join per probe. This is
 * the union trick instead: tag both sides, union them, and run ONE window
 * pass partitioned by key, ordered by (ts, side, seq), carrying the last
 * non-null right payload forward. Cost = one hash exchange on key + one
 * sort — the same shape as any windowed aggregate, no pair explosion.
 * Skew is bounded by the hottest single key (salt upstream if one key
 * dominates; see [[Skew]]).
 *
 * Tie semantics (deterministic, matching DuckDB ASOF / pandas.merge_asof):
 * right rows sort BEFORE left rows at equal ts (i.e. the match is
 * inclusive), and among right rows with identical (key, ts) the largest
 * `seqCol` wins.
 */
object AsofJoin {

  /**
   * @param left     probe side; all its columns pass through
   * @param right    build side; must share `keyCols`, `tsCol`, `seqCol`
   * @param keyCols  equality keys
   * @param tsCol    event-time column (any orderable type), present on both
   * @param seqCol   unique-per-row tiebreaker (e.g. event id), present on both
   * @param payload  right columns to attach (emitted as `prefix + name`,
   *                 plus `prefix + tsCol` for the matched event time)
   */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String],
      prefix: String = "matched_"): DataFrame = {
    val rStruct = struct((tsCol +: payload).map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType
    // normalize both sides to one schema: keys + side + right-payload struct
    // + every left column (right rows keep ts/seq for ordering, null the rest)
    val leftOther = left.columns.toSeq.filterNot(keyCols.contains)
    val lNorm = left.select(
      keyCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rStructType).as("__r")) ++
        leftOther.map(col): _*)
    // NULL semantics must match the equi+range join this replaces: a right
    // row with NULL ts can never satisfy `right.ts <= left.ts`, and a NULL
    // key never equi-matches — but unfiltered they would sort NULLS-FIRST
    // into the window (or form a NULL-key partition) and leak a match.
    val rNorm = right
      .filter((tsCol +: keyCols).map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++
          Seq(lit(0).as("__side"), rStruct.as("__r")) ++
          leftOther.map {
            case c if c == tsCol || c == seqCol => col(c)
            case c => lit(null).cast(left.schema(c).dataType).as(c)
          }: _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(seqCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        (tsCol +: payload).map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}
