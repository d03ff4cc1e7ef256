package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * String-similarity self-join with candidate generation BEFORE verification —
 * the same discipline as the dedup operators (DedupOps): never a quadratic
 * within-block pair space.
 *
 * The old plan blocked on a low-cardinality key alone (~25 brands ⇒ each
 * block n/25 rows ⇒ Θ(n²/25) verified pairs — quadratic in corpus size, the
 * round-1 bench's worst query). Here candidates must share a TOKEN of the
 * string (inverted-index join on (block, token)), which is a necessary
 * condition in practice for Ratcliff/Obershelp ≥ 0.8 on multi-word strings:
 * RO ≥ t needs matched chars ≥ t·(|a|+|b|)/2, far more than any single
 * word-sized block of matches. SimilarityJoinSpec pins output equality with
 * the brute-force within-block join on the driver corpus.
 *
 * Scale shape: candidate volume is Σ_(block,token) df² — bounded by the
 * token-df cap, not by block size. At web scale with an unbounded vocabulary,
 * token dfs are sublinear and the join stays near-linear in the true output.
 */
object SimilarityJoin {

  /**
   * Self-join of `names` on Ratcliff/Obershelp similarity ≥ threshold,
   * restricted to rows agreeing on `blockCols`.
   *
   * Output columns: (a, b, sim) with a < b by id and sim rounded to 4.
   *
   * Pruning layers, all candidates-side (cheap) before the O(len²) metric:
   *  1. inverted-index join on (blockCols, token) — pairs must share a word;
   *  2. token-df cap (SparkER-style blocking-key filter) — a safety valve
   *     against degenerate ubiquitous tokens (default high: lossless here);
   *  3. length band — RO ≥ t implies max(len) ≤ min(len)·(2/t − 1), since
   *     matched chars M ≤ min(len) and RO = 2M/(la+lb).
   */
  def roSelfJoin(names: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], threshold: Double, dfCap: Int = 10000): DataFrame = {
    require(threshold > 0.5, s"threshold $threshold too low for the length-band bound")
    val base = names.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+ col(nameCol).as("nm")): _*)
      .withColumn("len", length(col("nm")))
    val toks = base.withColumn("tok", explode(array_distinct(split(col("nm"), "\\s+"))))
    val dfCounts = toks.groupBy((blockCols.map(col) :+ col("tok")): _*)
      .agg(count(lit(1)).as("df"))
    val keyCols = blockCols :+ "tok"
    val filtered = toks.join(dfCounts.filter(col("df") <= dfCap), keyCols)
      .select((keyCols.map(col) :+ col("id") :+ col("nm") :+ col("len")): _*)
    val left = filtered
      .withColumnRenamed("id", "a").withColumnRenamed("nm", "na")
      .withColumnRenamed("len", "la")
    val right = filtered
      .withColumnRenamed("id", "b").withColumnRenamed("nm", "nb")
      .withColumnRenamed("len", "lb")
    val lengthBand = greatest(col("la"), col("lb")) <=
      least(col("la"), col("lb")) * (2.0 / threshold - 1.0)
    // distinct BEFORE the metric: a pair sharing k tokens must pay the
    // O(len²) similarity once, not k times
    val cand = left.join(right, keyCols)
      .filter(col("a") < col("b") && lengthBand)
      .select(col("a"), col("b"), col("na"), col("nb"))
      .distinct()
    cand
      .withColumn("sim", graft.functions.GraftFunctions.ro_sim(col("na"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
  }
}
