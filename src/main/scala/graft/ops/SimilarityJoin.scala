package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * String-similarity self-join with candidate generation BEFORE verification —
 * the same discipline as the dedup operators (DedupOps): never a quadratic
 * within-block pair space.
 *
 * Blocking keys (inverted-index join on (blockCols, key)):
 *  - every whitespace token of the string, and
 *  - for SINGLE-token strings only, every character 3-gram (so one-word
 *    names with a small spelling difference — which share no whole token —
 *    still meet in a bucket).
 *
 * APPROXIMATION, stated explicitly: Ratcliff/Obershelp >= t does NOT imply a
 * shared token. Miss classes of this blocking:
 *  (a) multi-token vs differently-tokenized variants with no common token
 *      ("fire brick" vs "firebrick" — RO ≈ 0.95, zero shared tokens; the
 *      single-token side emits 3-grams but the multi-token side does not);
 *  (b) multi-token pairs whose every shared word was df-capped;
 *  (c) single-token pairs shorter than 3 chars with no common 3-gram.
 * Extending 3-gram keys to all tokens would close (a) at a keys-per-row ×
 * join-volume cost quadratic in token df; callers needing exact recall on
 * such data should block on `charGramKeys` of the whole string instead.
 * SimilarityJoinSpec pins output equality with the brute-force within-block
 * join on the driver corpus (multi-word names) and the single-token gram
 * path on a spelling-variant fixture.
 *
 * Scale shape: candidate volume is Σ_(block,key) df² — bounded by the
 * key-df cap, not by block size. At web scale with an unbounded vocabulary,
 * key dfs are sublinear and the join stays near-linear in the true output.
 */
object SimilarityJoin {

  /** Blocking keys for one name: whitespace tokens, plus char 3-grams
   * (-prefixed to stay disjoint from word tokens) when the name is a
   * single token. */
  private def blockingKeys(nm: Column): Column = {
    val toks = array_distinct(split(nm, "\\s+"))
    when(size(toks) === 1, concat(toks, charGramKeys(nm))).otherwise(toks)
  }

  /** Character 3-gram keys of the whole string (-prefixed). Public so
   * callers with heavy tokenization-variant data can block on grams alone. */
  def charGramKeys(nm: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(nm) - 2, lit(1))),
      i => concat(lit(""), nm.substr(i, lit(3)))))


  /**
   * Self-join of `names` on Ratcliff/Obershelp similarity ≥ threshold,
   * restricted to rows agreeing on `blockCols`.
   *
   * Output columns: (a, b, sim) with a < b by id and sim rounded to 4.
   *
   * Pruning layers, all candidates-side (cheap) before the O(len²) metric:
   *  1. inverted-index join on (blockCols, key) — see blocking-key doc above;
   *  2. key-df cap (SparkER-style blocking-key filter) — a safety valve
   *     against degenerate ubiquitous keys (default high: lossless here);
   *  3. length band — RO ≥ t implies max(len) ≤ min(len)·(2/t − 1), since
   *     matched chars M ≤ min(len) and RO = 2M/(la+lb).
   *
   * Dedup placement: a pair sharing k keys is verified k times and collapsed
   * by ONE distinct on the OUTPUT (a, b, sim) — sized by true matches, not
   * candidates. The round-2 form deduped candidates first, which shuffled
   * every candidate pair with both name strings (measured sf0.1: 1.87 M wide
   * rows through the exchange to save 6% of verifies — the distinct cost
   * dominated the saved ro_sim calls). ro_sim is a codegen expression; k is
   * bounded by tokens-per-name, so verify-k-times is the cheaper side unless
   * names are pathologically self-similar.
   */
  def roSelfJoin(names: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], threshold: Double, dfCap: Int = 10000): DataFrame = {
    require(threshold > 0.5, s"threshold $threshold too low for the length-band bound")
    // fanOut: the tokenize + blocking-key explode is the expensive narrow
    // stage and runs at scan parallelism otherwise (Par.fanOut doc)
    val base = Par.fanOut(names.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+ col(nameCol).as("nm")): _*))
      .withColumn("len", length(col("nm")))
    val toks = base.withColumn("tok", explode(blockingKeys(col("nm"))))
    val dfCounts = toks.groupBy((blockCols.map(col) :+ col("tok")): _*)
      .agg(count(lit(1)).as("df"))
    val keyCols = blockCols :+ "tok"
    // df cap is a KEY-level filter: applying it to ONE side of the
    // self-join yields the identical pair set (a capped key contributes no
    // join rows once either side drops it) at half the df-join cost
    val filtered = toks.join(dfCounts.filter(col("df") <= dfCap), keyCols)
      .select((keyCols.map(col) :+ col("id") :+ col("nm") :+ col("len")): _*)
    val left = filtered
      .withColumnRenamed("id", "a").withColumnRenamed("nm", "na")
      .withColumnRenamed("len", "la")
    val right = toks
      .withColumnRenamed("id", "b").withColumnRenamed("nm", "nb")
      .withColumnRenamed("len", "lb")
    val lengthBand = greatest(col("la"), col("lb")) <=
      least(col("la"), col("lb")) * (2.0 / threshold - 1.0)
    left.join(right, keyCols)
      .filter(col("a") < col("b") && lengthBand)
      .withColumn("sim", graft.functions.GraftFunctions.ro_sim(col("na"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
      .distinct()
  }
}
