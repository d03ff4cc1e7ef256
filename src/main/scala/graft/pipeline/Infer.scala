package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Implicit entity inference (reference: entityextractor/core/
 * entity_inference.py:27-133): a second pass that ADDS entities the text
 * implies but does not name, marked `inferred=implicit`, then merges with
 * the explicit set keyed (name, type) with explicit overwriting implicit
 * (entity_inference.py:130-133).
 *
 * Deterministic stand-in for the inference LLM: the KB neighbors
 * (partOf / hasParts / memberOf targets) of a document's linked entities
 * become that document's implicit entities — the same "world knowledge
 * around the explicit entities" the reference prompt asks for, sourced from
 * the broadcast Wikidata property dim instead of a model call.
 */
object Infer {

  /** Sentinel first-position for entities with no citation span in the text
   * (the reference leaves citation_start unset for implicit entities). They
   * sort AFTER every real offset, so explicit co-occurrence order is
   * unchanged. */
  val NoPosition: Int = Int.MaxValue

  /**
   * Implicit entity rows for each document: KB neighbors of the document's
   * linked entities. Names also present explicitly are displaced by the
   * merge, mirroring the reference's dict overwrite. Output schema matches
   * Link.docEntities.
   */
  /** @param broadcastDim ship the two KB dims as broadcast build sides —
   * the same cutover every sibling stage carries (Link/Relate/kgc/
   * Canonicalize); false = shuffled joins for KBs past the ~5 GB broadcast
   * ceiling. */
  def implicitDocEntities(docEntities: DataFrame, wikidata: Dataset[KbWikidata],
      labels: Dataset[KbLabel], broadcastDim: Boolean = true): DataFrame = {
    val spark = docEntities.sparkSession
    import spark.implicits._
    def dim(df: DataFrame): DataFrame = if (broadcastDim) broadcast(df) else df
    val kbRel = wikidata.select($"qid",
      explode(concat($"partOf", $"hasParts", $"memberOf")).as("target"))
    // target title → its own KB identity (qid + type), from the exact-alias rows
    val targetInfo = labels.filter($"aliasKind" === "exact")
      .select($"canonicalTitle".as("target"), $"qid".as("targetQid"),
        $"entityType".as("targetType"))
      .dropDuplicates("target")
    val lifted = docEntities
      .join(dim(kbRel.toDF()), Seq("qid"))
      .select($"docId", $"repo", $"path", $"lang", $"target")
      .distinct()
      .join(dim(targetInfo), Seq("target"))
    lifted.select(
      $"docId", $"target".as("entityName"), $"repo", $"path", $"lang",
      $"targetType".as("entityType"), $"targetQid".as("qid"),
      lit(PipelineSchema.InferredImplicit).as("inferred"),
      lit(NoPosition).as("firstPos"))
  }

  /**
   * Merge explicit-over-implicit keyed (docId, name, type)
   * (entity_inference.py:130-133): an explicit row displaces the implicit
   * row of the same key; implicit-only keys survive. One hash aggregate
   * with map-side partials — never a window over the corpus.
   */
  def mergeExplicitOverImplicit(explicitEnts: DataFrame, implicitEnts: DataFrame): DataFrame = {
    val all = explicitEnts.unionByName(implicitEnts)
    val prio = when(col("inferred") === PipelineSchema.InferredExplicit, 0).otherwise(1)
    val payload = struct(all.columns.map(col): _*)
    all
      .groupBy(col("docId"), col("entityName"), col("entityType"))
      .agg(min_by(payload, struct(prio.as("p"), col("firstPos"))).as("best"))
      .select(col("best.*"))
  }

  /** Full inference pass as wired by the pipeline. */
  def withImplicit(docEntities: DataFrame, wikidata: Dataset[KbWikidata],
      labels: Dataset[KbLabel], broadcastDim: Boolean = true): DataFrame =
    mergeExplicitOverImplicit(docEntities,
      implicitDocEntities(docEntities, wikidata, labels, broadcastDim))
}
