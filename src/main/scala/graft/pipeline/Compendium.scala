package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Deterministic compendium assembly (reference:
 * entityextractor/services/compendium_service.py:9-89): per document, a
 * summary text assembled from the KB extracts of its entities in
 * first-occurrence order, plus a numbered reference list with
 * order-preserving first-occurrence dedup (the reference's
 * list(dict.fromkeys(refs)) idiom, compendium_service.py:63).
 * The reference's final LLM call is replaced by the deterministic
 * concatenation — same inputs, same citation structure, reproducible output.
 */
object Compendium {

  /** Order-preserving dedup of an array column (keeps FIRST occurrence,
   * preserves order) — array_distinct has exactly these semantics. */
  def dedupPreserveOrder(arr: Column): Column = array_distinct(arr)

  /**
   * Per-document compendium: (docId, compendium, references).
   *
   * @param lengthBudget COMPENDIUM_LENGTH (reference settings.py:67, default
   * 8000 chars): the assembled text is truncated at the last SENTENCE
   * boundary (final '.') within the budget — never mid-sentence — falling
   * back to a hard cut only for degenerate dot-free text
   * (compendium_service.py:66-86 passes the budget to the summarizer; the
   * deterministic stand-in enforces it on the assembly).
   * @param educational COMPENDIUM_EDUCATIONAL_MODE (settings.py:68): the
   * reference switches the summarizer prompt to a learner-oriented framing;
   * the deterministic stand-in prefixes the equivalent framing header so the
   * mode is visible and testable in the output.
   */
  def perDocument(linked: Dataset[LinkedEntity], lengthBudget: Int = 8000,
      educational: Boolean = false): DataFrame = {
    val spark = linked.sparkSession
    import spark.implicits._
    val assembled = array_join(
      transform(col("ordered"), x => x.getField("wikipediaExtract")), " ")
    val full =
      if (educational) concat(lit("Overview for learners: "), assembled)
      else assembled
    val capped = substring(full, 1, lengthBudget)
    // text after the last '.' of the capped prefix; removing it cuts at the
    // final complete sentence
    val afterLastDot = substring_index(capped, ".", -1)
    val budgeted = when(length(full) <= lengthBudget, full)
      .otherwise(when(length(afterLastDot) < length(capped),
        capped.substr(lit(1), length(capped) - length(afterLastDot)))
        .otherwise(capped))
    linked
      .filter($"wikipediaExtract".isNotNull)
      // ONE extract per (doc, entity): linked is mention-level, and an
      // entity mentioned k times would repeat its extract k times, burning
      // the length budget on duplicates (the reference assembles from the
      // deduped per-doc entity list, compendium_service.py:17-43). First
      // occurrence keeps the citation order; min() on the extract is a
      // deterministic pick of identical values.
      .groupBy($"docId", $"entityName")
      .agg(min($"citationStart").as("citationStart"),
        min($"wikipediaExtract").as("wikipediaExtract"))
      .groupBy($"docId")
      .agg(
        // collect in first-occurrence order via sort on (offset, text)
        array_sort(collect_list(struct($"citationStart", $"entityName", $"wikipediaExtract")))
          .as("ordered"))
      .select(
        $"docId",
        budgeted.as("compendium"),
        // numbered, order-preserving-deduped reference list
        transform(
          dedupPreserveOrder(transform($"ordered", x =>
            graft.functions.TextFunctions.sanitizeWikipediaUrl(
              concat(lit("https://en.wikipedia.org/wiki/"),
                replace(x.getField("entityName"), lit(" "), lit("_")))))),
          ref => ref)
          .as("references"))
      .withColumn("referencesNumbered",
        transform(col("references"),
          (ref, i) => concat(lit("("), (i + 1).cast("string"), lit(") "), ref)))
  }
}
