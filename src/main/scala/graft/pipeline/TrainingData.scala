package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * JSONL training-data sinks (reference R10: openai_service.py:133-209,
 * generator.py:26-76): one {"messages":[system,user,assistant]} object per
 * document, with the assistant content in the reference's semicolon-line
 * format ("name; type; url; citation" for entities; "subject; predicate;
 * object" for relations). `ds.write.json(path)` emits exactly JSONL.
 */
object TrainingData {

  val EntitySystemPrompt =
    "Extract named entities as lines: name; type; url; citation"
  val RelationSystemPrompt =
    "Extract relationships as lines: subject; predicate; object"
  val GenerateSystemPrompt =
    "Generate entities about the topic as lines: name; type; url; citation"

  private def message(role: String, content: Column) =
    struct(lit(role).as("role"), content.as("content"))

  /** Per-document assistant content: semicolon entity lines in
   * first-occurrence order (shared by the extract and generate sinks).
   *
   * The 4th field is the CITATION — the exact surface span from the document
   * at the entity's first occurrence (reference: openai_service.py:158-173
   * emits the entity dict's citation, which the extractor filled with the
   * supporting text span). Inputs carrying a `citation` column (the packaged
   * entities, Link.packagedEntities) use it; generate-mode inputs have no
   * document span, so the entity name stands in — same as the reference's
   * generator flow, where no source text exists. */
  private def assistantEntityLines(docEntities: DataFrame): DataFrame =
    docEntities
      .withColumn("line", concat_ws("; ",
        col("entityName"), col("entityType"),
        // sanitized like Package's URLs — the same entity must not carry a
        // raw URL here and an escaped one in the result document
        graft.functions.TextFunctions.sanitizeWikipediaUrl(
          concat(lit("https://en.wikipedia.org/wiki/"),
            replace(col("entityName"), lit(" "), lit("_")))),
        if (docEntities.columns.contains("citation"))
          coalesce(col("citation"), col("entityName"))
        else col("entityName")))
      .groupBy(col("docId"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("firstPos"), col("line")))),
        x => x.getField("line")), "\n").as("assistant"))

  /** Entity-extraction examples: user = document content, assistant =
   * semicolon lines of the document's entities in first-occurrence order. */
  def entityExamples(corpus: Dataset[SourceFile], docEntities: DataFrame): DataFrame = {
    val lines = assistantEntityLines(docEntities)
    corpus
      .withColumn("docId", concat(col("repo"), lit(":"), col("path")))
      .join(lines, Seq("docId"))
      .select(array(
        message("system", lit(EntitySystemPrompt)),
        message("user", col("content")),
        message("assistant", col("assistant"))).as("messages"))
  }

  /** Relation examples: assistant = "subject; predicate; object" lines in a
   * deterministic order. */
  def relationExamples(corpus: Dataset[SourceFile], triples: Dataset[Triple]): DataFrame = {
    val lines = triples
      .withColumn("line", concat_ws("; ", col("subject"), col("predicate"), col("obj")))
      .groupBy(col("docId"))
      .agg(array_join(array_sort(collect_list(col("line"))), "\n").as("assistant"))
    corpus
      .withColumn("docId", concat(col("repo"), lit(":"), col("path")))
      .join(lines, Seq("docId"))
      .select(array(
        message("system", lit(RelationSystemPrompt)),
        message("user", col("content")),
        message("assistant", col("assistant"))).as("messages"))
  }

  /** Generate-mode examples (reference: generator.py:26-76): user = the
   * TOPIC (not a document), assistant = the generated entities' semicolon
   * lines. docId convention: "generate:<topicId>" (Generate.corpusFromTopics). */
  def generationExamples(topics: DataFrame, docEntities: DataFrame): DataFrame = {
    val lines = assistantEntityLines(docEntities)
    topics
      .withColumn("docId", concat(lit("generate:"), col("topicId").cast("string")))
      .join(lines, Seq("docId"))
      .select(array(
        message("system", lit(GenerateSystemPrompt)),
        message("user", col("topic")),
        message("assistant", col("assistant"))).as("messages"))
  }

  def write(examples: DataFrame, path: String): Unit =
    examples.write.mode("append").json(path)
}
