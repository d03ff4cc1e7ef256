package graft.pipeline

/**
 * Typed data model for the KG-construction pipeline.
 *
 * Re-expresses the reference's dynamic dict records (SURVEY.md §1.1 R1-R8;
 * reference: entityextractor/core/orchestrator.py, the service modules) as fixed
 * Spark schemas: every optional dict key becomes a nullable column.
 */

/** Input corpus row — shape fixed by BASELINE.json input_hint. */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Manifest row for the per-row content-integrity invariant (sha2(content,256)). */
final case class ManifestRow(
    repo: String,
    path: String,
    commit: String,
    sha256: String)

/** One overlapping character window of a document (reference: text_utils.py:89-111). */
final case class Chunk(
    docId: String,
    repo: String,
    path: String,
    lang: String,
    chunkId: Int,
    chunkStart: Int,
    chunkText: String,
    // true only for the document's final chunk: an interior chunk END is a
    // CUT, not a word boundary — mention detection must not treat it as one
    chunkIsLast: Boolean)

/**
 * Raw entity mention (reference R2: openai_service.py:107-122), emitted by the
 * trie gazetteer with exact document-coordinate offsets (the reference computes
 * them after the fact via text.find, orchestrator.py:80-88).
 */
final case class Mention(
    docId: String,
    repo: String,
    path: String,
    lang: String,
    chunkId: Int,
    surface: String,
    aliasNorm: String,
    citationStart: Int,
    citationEnd: Int,
    inferred: String) // "explicit" | "implicit"

/** One KB alias-index row (replaces Wikipedia opensearch/redirect/synonym HTTP fallbacks). */
final case class KbLabel(
    aliasNorm: String,
    canonicalTitle: String,
    qid: String,
    aliasKind: String, // exact | redirect | synonym  (drives deterministic score)
    entityType: String,
    popularity: Long, // deterministic tie-break stand-in for API ranking
    lang: String,
    extract: String,
    categories: Seq[String])

/** Geographic coordinates (reference R7 `coordinates{lat,lon}`,
 * wikidata_service.py:496-499). */
final case class Coordinates(latitude: Double, longitude: Double)

/** Wikidata-property fixture row (reference R7: wikidata_service.py:386-673).
 * Time fields carry the RAW Wikidata form ("+YYYY-MM-DDT00:00:00Z") — the
 * packaging stage trims them with TextFunctions.trimWikidataTime, exactly
 * where the reference applies its format_wikidata_date
 * (wikidata_service.py:506-513). Nullable = absent claim. */
final case class KbWikidata(
    qid: String,
    label: String,
    description: String,
    aliases: Seq[String],
    instanceOf: Seq[String],
    subclassOf: Seq[String],
    partOf: Seq[String],
    hasParts: Seq[String],
    memberOf: Seq[String],
    officialWebsite: String,
    coordinates: Coordinates = null, // P625
    birthDate: String = null, // P569, raw time string
    deathDate: String = null, // P570
    foundingDate: String = null, // P571
    gndId: String = null) // P227

/** Wikipedia ADDITIONAL_DETAILS dim (reference: wikipedia_service.py:514-603
 * — infobox scrape, see-also links, main image), keyed by canonical title.
 * A separate dimension so the hot linking path never carries these columns;
 * Package joins it only when the flag is on. */
final case class KbWikipediaDetails(
    title: String,
    infobox: Map[String, String],
    seeAlso: Seq[String],
    image: String)

/** DBpedia-property fixture row (reference R8: dbpedia_service.py:367-501). */
final case class KbDbpedia(
    resourceUri: String,
    qid: String, // sameAs bridge to Wikidata
    label: String,
    abstractText: String,
    types: Seq[String],
    subjects: Seq[String],
    partOf: Seq[String],
    hasParts: Seq[String],
    memberOf: Seq[String])

/**
 * Linked entity (reference R3: linker.py:56-227) — mention resolved to KB ids.
 * Null qid = unlinked (the reference keeps unlinked entities too).
 */
final case class LinkedEntity(
    docId: String,
    repo: String,
    path: String,
    lang: String,
    surface: String,
    citationStart: Int,
    citationEnd: Int,
    inferred: String,
    entityName: String, // canonical title
    entityType: String,
    qid: String,
    wikipediaTitle: String,
    wikipediaExtract: String,
    categories: Seq[String],
    linkScore: Double)

/** Triple (reference R4: relationship_inference.py:243-253; README.md:323-331). */
final case class Triple(
    subject: String,
    predicate: String,
    obj: String,
    inferred: String, // explicit | implicit
    subjectType: String,
    objectType: String,
    subjectInferred: String,
    objectInferred: String,
    docId: String,
    lang: String)

/** Canonicalized triple: subject/object rewritten to canonical component ids. */
final case class CanonicalTriple(
    subjectId: String,
    subject: String,
    predicate: String,
    objectId: String,
    obj: String,
    inferred: String,
    subjectType: String,
    objectType: String,
    docId: String,
    lang: String)

/** Per-partition lineage row written beside every stage output (north_star). */
final case class LineageRow(
    stage: String,
    partitionId: Int,
    rowCount: Long,
    sha256: String)

object PipelineSchema {
  val InferredExplicit = "explicit"
  val InferredImplicit = "implicit"
  /** Sentinel docId/lang stamped on KGC-lifted triples (they are KB-derived,
   * not grounded in any document). */
  val KgcDocId = "kgc"
}
