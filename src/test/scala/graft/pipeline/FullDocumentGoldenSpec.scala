package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Whole-output-document golden (round-3 VERDICT #7): assemble the COMPLETE
 * reference-shaped result JSON for one document — entities (R5, incl.
 * ADDITIONAL_DETAILS blocks), relationships (R4), per-document statistics
 * (R6, full key set), compendium + numbered references — and byte-compare it
 * against a checked-in golden. This pins the entire output contract
 * (field names, nesting, ordering, value formatting), not just the R6 key
 * set; the reference's worked example fixes the same shape
 * (/root/reference/README.md:79-141).
 *
 * Regenerate after INTENDED output-contract changes with:
 *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.pipeline.FullDocumentGoldenSpec"
 * then review the diff of src/test/resources/golden/result_document.json.
 */
class FullDocumentGoldenSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/golden/result_document.json")

  test("one full result document matches the checked-in golden byte-for-byte") {
    val corpus = Corpus.generate(spark, 6L, 3, 42L, 2).persist()
    val result = Pipeline.run(spark, corpus)
    val docId = {
      val p = Corpus.plan(42L, 6L, 3, 0L)
      Corpus.docId(p.repo, p.path)
    }

    val packaged = Package.packagedEntities(
      result.linked, result.docEntities, KB.wikidata(spark), KB.dbpedia(spark),
      Some(KB.wikipediaDetails(spark)),
      dbpediaLookup = Some(KB.dbpediaLookup(spark))) // same fallback statisticsJson counts
    val docs = Package.resultDocuments(packaged, result.triples)
      .filter(col("docId") === docId)
      // deterministic member order regardless of partitioning: array_sort
      // with explicit scalar-key comparators (default struct ordering cannot
      // order the infobox MAP field)
      .select(
        array_sort(col("entities"), (l, r) => {
          val (a, b) = (l.getField("entity"), r.getField("entity"))
          when(a < b, -1).when(a > b, 1).otherwise(0)
        }).as("entities"),
        array_sort(col("relationships"), (l, r) => {
          def key(x: org.apache.spark.sql.Column) = concat_ws("",
            x.getField("subject"), x.getField("predicate"),
            x.getField("object"), x.getField("inferred"))
          val (a, b) = (key(l), key(r))
          when(a < b, -1).when(a > b, 1).otherwise(0)
        }).as("relationships"))
    val entRelJson = docs.toJSON.collect().head

    val linkedDoc = result.linked.filter(col("docId") === docId)
    val statsJson = Stats.statisticsJson(
      linkedDoc,
      result.docEntities.filter(col("docId") === docId),
      result.triples.filter(col("docId") === docId),
      KB.wikidata(spark), KB.dbpedia(spark), Some(KB.dbpediaLookup(spark)))

    val compRow = Compendium.perDocument(linkedDoc).filter(col("docId") === docId)
      .select(col("compendium"), col("referencesNumbered")).collect().head
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val refsJson = compRow.getSeq[String](1).map(jstr).mkString("[", ", ", "]")

    val document =
      entRelJson.dropRight(1) +
        s""","statistics":$statsJson,"compendium":${jstr(compRow.getString(0))},"compendium_references":$refsJson}"""
    // pretty-enough stability check: exact bytes
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, document)
      info(s"golden regenerated at $goldenPath (${document.length} bytes)")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"golden missing — run with GRAFT_REGEN_GOLDEN=1 to create $goldenPath")
      val expected = java.nio.file.Files.readString(goldenPath)
      assert(document == expected,
        s"output document drifted from golden (${document.length} vs ${expected.length} bytes)")
    }
    // structural sanity independent of the byte compare: the reference's
    // top-level key set and R5 nesting are present
    assert(document.contains("\"entities\":[{\"entity\":"))
    assert(document.contains("\"details\":{\"typ\":"))
    assert(document.contains("\"sources\":{\"wikipedia\":"))
    assert(document.contains("\"relationships\":"))
    assert(document.contains("\"types_distribution\""))
    assert(document.contains("\"entity_connections\""))
    assert(document.contains("\"compendium\""))
  }
}
