package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Generate mode (reference: entityextractor/core/generator.py:78-191,
 * generate_api.py:12-28, main.py generate flow): instead of extracting
 * entities FROM a text, the reference asks the LLM for entities ABOUT a
 * topic — everything marked `inferred=implicit` (generator.py:175) — and
 * builds the relation context from the entities' Wikipedia extracts instead
 * of the input text (orchestrator.py:338-341). The rest of the DAG is
 * identical.
 *
 * Deterministic Spark stand-in: the "LLM generation" becomes a KB-driven
 * selection — entities whose alias tokens match the topic, ranked by
 * (matched tokens, popularity) — and the "context from extracts" becomes a
 * pseudo-document per topic concatenating the selected entities' KB
 * extracts. That pseudo-corpus then runs through the SAME pipeline
 * (detect → link → relate → dedup → canonicalize) with mentions flagged
 * implicit, exactly the "same DAG, different mention source + a flag
 * column" shape of SURVEY.md §3.3.
 */
object Generate {

  /**
   * Deterministic stand-in for the generate-mode LLM call: score KB entities
   * against the topic by alias-token overlap, keep the top `maxEntities`
   * per topic by (hits desc, popularity desc, title asc) — mirrors
   * MAX_ENTITIES (generator.py:113).
   *
   * Input `topics`: (topicId: string, topic: string). The label index is
   * dimension-sized, so the token join is broadcast; the per-topic rank is a
   * window over ≤ |KB| candidate rows per topic.
   */
  def selectEntities(topics: DataFrame, labels: Dataset[KbLabel],
      maxEntities: Int = 10): DataFrame = {
    // topic normalization mirrors the FULL alias norm (lowercase,
    // underscores = spaces, parens stripped, trimmed) so "streams (lumina)"
    // tokenizes to the same "lumina" the alias index carries
    val topicToks = topics.select(col("topicId"), col("topic"),
      explode(array_distinct(split(
        graft.functions.TextFunctions.labelNorm(col("topic")), "\\s+"))).as("tok"))
    val aliasToks = labels
      .select(col("canonicalTitle"), col("qid"), col("entityType"),
        col("popularity"), col("extract"),
        explode(array_distinct(split(col("aliasNorm"), "\\s+"))).as("tok"))
      .dropDuplicates("canonicalTitle", "tok")
    val scored = topicToks.join(broadcast(aliasToks), Seq("tok"))
      .groupBy(col("topicId"), col("topic"), col("canonicalTitle"), col("qid"),
        col("entityType"), col("popularity"), col("extract"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col("topicId"))
      .orderBy(desc("hits"), desc("popularity"), asc("canonicalTitle"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxEntities)
  }

  /**
   * One pseudo-document per topic: content = the selected entities' KB
   * extracts concatenated in rank order (the generate-mode relation context,
   * orchestrator.py:338-341). docId becomes "generate:<topicId>".
   */
  def corpusFromTopics(topics: DataFrame, labels: Dataset[KbLabel],
      maxEntities: Int = 10): Dataset[SourceFile] = {
    val spark = topics.sparkSession
    import spark.implicits._
    selectEntities(topics, labels, maxEntities)
      .groupBy(col("topicId"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rank"), col("extract")))),
        x => x.getField("extract")), " ").as("content"))
      .select(
        lit("generate").as("repo"),
        col("topicId").cast("string").as("path"),
        lit("generate").as("commit"),
        lit("en").as("lang"),
        col("content"))
      .as[SourceFile]
  }
}
