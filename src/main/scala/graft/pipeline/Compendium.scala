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

  /** Per-document compendium: (docId, compendium, references). */
  def perDocument(linked: Dataset[LinkedEntity]): DataFrame = {
    val spark = linked.sparkSession
    import spark.implicits._
    linked
      .filter($"wikipediaExtract".isNotNull)
      .groupBy($"docId")
      .agg(
        // collect in first-occurrence order via sort on (offset, text)
        array_sort(collect_list(struct($"citationStart", $"entityName", $"wikipediaExtract")))
          .as("ordered"))
      .select(
        $"docId",
        array_join(transform($"ordered", x => x.getField("wikipediaExtract")), " ")
          .as("compendium"),
        // numbered, order-preserving-deduped reference list
        transform(
          dedupPreserveOrder(transform($"ordered", x =>
            concat(lit("https://en.wikipedia.org/wiki/"),
              replace(x.getField("entityName"), lit(" "), lit("_"))))),
          ref => ref)
          .as("references"))
      .withColumn("referencesNumbered",
        transform(col("references"),
          (ref, i) => concat(lit("("), (i + 1).cast("string"), lit(") "), ref)))
  }
}
