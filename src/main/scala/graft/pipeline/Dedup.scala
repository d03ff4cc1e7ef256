package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Stage 4: triple deduplication chain, mirroring the reference's three-level
 * dedup (reference: orchestrator.py:63-76):
 *
 *  1. exact dedup on (s,p,o) with explicit-over-implicit preference
 *     (orchestrator.py:63-72) — a window argmin;
 *  2. per-undirected-pair predicate consolidation (the LLM pair-dedup,
 *     deduplication_utils.py:12-87) replaced by a deterministic total order:
 *     explicit first, then shortest predicate, then lexicographic;
 *  3. fuzzy predicate clustering per pair with Ratcliff/Obershelp ≥ 0.85,
 *     keep the shortest of each cluster (semantic_dedup_utils.py:3-36) — a
 *     typed flatMapGroups (groups are tiny: ≤ MAX_RELATIONS per pair).
 *
 * All three shuffle at most once on high-cardinality keys; the undirected
 * pair key (least, greatest) cannot hot-spot worse than the hottest entity
 * pair, and partial aggregation applies to the window shuffles.
 */
object Dedup {

  private def inferredPriority = when(col("inferred") === PipelineSchema.InferredExplicit, 0).otherwise(1)

  /** Exact (s,p,o) dedup, explicit wins over implicit; deterministic
   * tie-break on provenance for reproducibility at any parallelism. */
  def exact(triples: Dataset[Triple]): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    // min_by hash aggregate, not a window: one group per distinct triple,
    // partial aggregation collapses duplicates map-side before the shuffle
    val payload = struct($"subject", $"predicate", $"obj", $"inferred",
      $"subjectType", $"objectType", $"subjectInferred", $"objectInferred",
      $"docId", $"lang")
    triples
      .groupBy($"subject", $"predicate", $"obj")
      .agg(min_by(payload, struct(inferredPriority.as("p"), $"docId", $"lang")).as("best"))
      .select($"best.*")
      .as[Triple]
  }

  /** Undirected pair key columns. Self-pairs (s == o) group with themselves
   * (reference allows them, deduplication_utils.py:38-43). */
  private def pairKey: Seq[org.apache.spark.sql.Column] =
    Seq(least(col("subject"), col("obj")).as("pairA"),
      greatest(col("subject"), col("obj")).as("pairB"))

  /** One triple per undirected entity pair: explicit > implicit, then
   * shortest predicate, then lexicographic predicate/subject/object —
   * the deterministic stand-in for the reference's LLM "most relevant
   * predicate" choice (deduplication_utils.py:60-76). */
  def consolidatePairs(triples: Dataset[Triple]): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val payload = struct($"subject", $"predicate", $"obj", $"inferred",
      $"subjectType", $"objectType", $"subjectInferred", $"objectInferred",
      $"docId", $"lang")
    val ordKey = struct(inferredPriority.as("p"), length($"predicate").as("len"),
      $"predicate", $"subject", $"obj")
    triples
      .groupBy(least($"subject", $"obj").as("pairA"), greatest($"subject", $"obj").as("pairB"))
      .agg(min_by(payload, ordKey).as("best"))
      .select($"best.*")
      .as[Triple]
  }

  /** Greedy fuzzy predicate clustering per undirected pair; keeps the
   * shortest predicate of each similarity cluster. Input order inside a
   * group is fixed by a total sort so results are partition-invariant
   * (the reference iterates Python list order, semantic_dedup_utils.py:20-33
   * — order-dependent; we pin it). */
  def fuzzy(triples: Dataset[Triple], threshold: Double = 0.85): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples
      .groupByKey(t => {
        val a = if (t.subject <= t.obj) t.subject else t.obj
        val b = if (t.subject <= t.obj) t.obj else t.subject
        (a, b)
      })
      .flatMapGroups { (_: (String, String), it: Iterator[Triple]) =>
        val rels = it.toVector.sortBy(t =>
          (if (t.inferred == PipelineSchema.InferredExplicit) 0 else 1,
            t.predicate.length, t.predicate, t.subject, t.obj))
        val clusters = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Triple]]()
        rels.foreach { r =>
          clusters.find(c => RatcliffObershelp.ratio(c.head.predicate, r.predicate) >= threshold) match {
            case Some(c) => c += r
            case None => clusters += scala.collection.mutable.ArrayBuffer(r)
          }
        }
        // keep the shortest predicate per cluster (ties: input order = the
        // total sort above, so .minBy is deterministic)
        clusters.map(c => c.minBy(t => (t.predicate.length, t.predicate))).toVector
      }
  }

  /** Full chain as run by the pipeline. */
  def all(triples: Dataset[Triple]): Dataset[Triple] =
    fuzzy(consolidatePairs(exact(triples)))
}

/**
 * Ratcliff/Obershelp similarity = 2*M / (|a|+|b|), M = recursively matched
 * chars around the longest common substring — the metric behind Python
 * difflib.SequenceMatcher.ratio() used by the reference
 * (semantic_dedup_utils.py:27). Implemented from the published definition;
 * `levenshtein` is NOT a drop-in (different metric ⇒ different clusters).
 */
object RatcliffObershelp {

  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else 2.0 * matchedChars(a, b) / (a.length + b.length)
  }

  private def matchedChars(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    // longest common substring; ties broken by earliest start in a, then b
    var bestLen = 0; var bestI = 0; var bestJ = 0
    val m = b.length
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < m) {
        cur(j + 1) = if (a.charAt(i) == b.charAt(j)) prev(j) + 1 else 0
        if (cur(j + 1) > bestLen) {
          bestLen = cur(j + 1); bestI = i - bestLen + 1; bestJ = j - bestLen + 1
        }
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    if (bestLen == 0) 0
    else bestLen +
      matchedChars(a.substring(0, bestI), b.substring(0, bestJ)) +
      matchedChars(a.substring(bestI + bestLen), b.substring(bestJ + bestLen))
  }
}
