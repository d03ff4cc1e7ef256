package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Stage 2: entity linking = candidate generation + deterministic
 * window-ranked argmax disambiguation (north_star).
 *
 * Replaces the reference's sequential 4-level fallback cascade per entity
 * (reference: entityextractor/core/linker.py:63-121 — LLM URL, opensearch
 * top-1, redirect follow, synonym retry) with ONE broadcast hash join against
 * a union'd alias index whose aliasKind column encodes the fallback level;
 * the cascade's short-circuit priority becomes the ORDER BY of a window
 * row_number (SURVEY.md §2.4). Candidate scoring is deterministic
 * (kind priority, then popularity, then qid) so results are reproducible at
 * any parallelism — the reference instead trusts API result order
 * (wikidata_service.py:59-64).
 *
 * Scale notes: the probe side (mentions) never shuffles for the lookup —
 * broadcast join only. The argmax window shuffles by (docId, citationStart),
 * a high-cardinality composite key that cannot hot-spot on ubiquitous alias
 * surfaces (the skew-defusing property the north_rule asks for: the heavy
 * key "buffer" is spread across every document it occurs in).
 */
object Link {

  /** Candidate rows: one per (mention, KB alias hit). */
  def candidates(mentions: Dataset[Mention], labels: Dataset[KbLabel]): DataFrame = {
    val kindPrio = when(col("aliasKind") === "exact", 0)
      .when(col("aliasKind") === "redirect", 1)
      .otherwise(2)
    mentions.join(
        broadcast(labels.withColumn("kindPriority", kindPrio)
          .withColumnRenamed("lang", "kbLang")), // KB lang must not shadow the document lang
        Seq("aliasNorm"), "left")
      .withColumn("linkScore",
        when(col("qid").isNull, lit(0.0))
          .otherwise(col("popularity").cast("double") - col("kindPriority") * 1000000.0))
  }

  /** Argmax per mention: best candidate by (kind priority, popularity desc,
   * qid asc). Unmatched mentions survive with null qid — the reference keeps
   * unlinked entities too (linker.py:227). */
  def link(mentions: Dataset[Mention], labels: Dataset[KbLabel]): Dataset[LinkedEntity] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val w = Window
      .partitionBy($"docId", $"citationStart")
      .orderBy(desc("linkScore"), asc("qid"))
    candidates(mentions, labels)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"docId", $"repo", $"path", $"lang", $"chunkId", $"surface",
        $"citationStart", $"citationEnd", $"inferred",
        coalesce($"canonicalTitle", $"surface").as("entityName"),
        coalesce($"entityType", lit("UNKNOWN")).as("entityType"),
        $"qid",
        $"canonicalTitle".as("wikipediaTitle"),
        $"extract".as("wikipediaExtract"),
        coalesce($"categories", array()).as("categories"),
        $"linkScore")
      .as[LinkedEntity]
  }

  /**
   * Per-document entity dimension: distinct entities, first occurrence wins
   * (reference entity dedup by URL-or-name, orchestrator.py:56-61). One row
   * per (docId, entityName) ordered by first citation offset.
   */
  def docEntities(linked: Dataset[LinkedEntity]): DataFrame = {
    val spark = linked.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"docId", $"entityName").orderBy($"citationStart")
    linked
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"docId", $"repo", $"path", $"lang", $"entityName", $"entityType",
        $"qid", $"inferred", $"citationStart".as("firstPos"),
        $"surface".as("citation"), $"citationEnd")
  }
}
