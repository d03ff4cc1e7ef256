package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Stage 8: packaged entity records — the reference's legacy output shape R5
 * (reference: entityextractor/core/orchestrator.py:349-445; worked example
 * README.md:79-97): per entity, `details` (type, inferred, citation with
 * exact offsets) and nested `sources.{wikipedia, wikidata, dbpedia}` blocks
 * populated from the broadcast KB dimensions.
 *
 * Dynamic optional dict keys of the reference become nullable struct fields
 * (SURVEY.md §1.2); sources absent in the KB are null structs, mirroring the
 * reference's conditional source attachment (orchestrator.py:371-444).
 */
object Package {

  def packagedEntities(
      linked: Dataset[LinkedEntity],
      docEntities: DataFrame,
      wikidata: Dataset[KbWikidata],
      dbpedia: Dataset[KbDbpedia],
      wikipediaDetails: Option[Dataset[KbWikipediaDetails]] = None,
      dbpediaLookup: Option[DataFrame] = None): DataFrame = {
    val withSpans = Link.packagedEntities(linked, docEntities)
    val wd = broadcast(wikidata.toDF()
      .select(col("qid").as("wdQid"), col("label").as("wdLabel"),
        col("description").as("wdDescription"), col("aliases"),
        col("instanceOf"), col("partOf"), col("hasParts"), col("memberOf"),
        col("officialWebsite"), col("coordinates"), col("birthDate"),
        col("deathDate"), col("foundingDate"), col("gndId")))
    val dbp = broadcast(dbpedia.toDF()
      .select(col("qid").as("dbQid"), col("resourceUri"),
        col("abstractText"), col("types").as("dbTypes"),
        col("subjects"), col("partOf").as("dbPartOf"),
        col("hasParts").as("dbHasParts"), col("memberOf").as("dbMemberOf")))
    val base = linked.toDF()
      .select(col("docId").as("lDocId"), col("entityName").as("lName"),
        col("wikipediaTitle"), col("wikipediaExtract"), col("categories"))
      .dropDuplicates("lDocId", "lName")

    // ADDITIONAL_DETAILS gate (wikipedia_service.py:514-603 + linker.py:129-134):
    // the details dim joins (broadcast) ONLY when asked for — the extra
    // columns never ride the pipeline otherwise
    val detailFields: Seq[org.apache.spark.sql.Column] = wikipediaDetails match {
      case Some(_) => Seq(col("infobox"), col("seeAlso").as("see_also"), col("image"))
      case None => Seq.empty
    }
    val joined0 = withSpans
      .join(base, col("docId") === col("lDocId") && col("entityName") === col("lName"), "left")
      .join(wd, col("qid") === col("wdQid"), "left")
      .join(dbp, col("qid") === col("dbQid"), "left")
    val joined1 = wikipediaDetails match {
      case Some(det) => joined0.join(
        broadcast(det.toDF().withColumnRenamed("title", "detTitle")),
        col("wikipediaTitle") === col("detTitle"), "left")
      case None => joined0
    }
    // DBpedia Lookup fallback (dbpedia_service.py:103-197): entities whose
    // qid has no row in the qid-keyed dim still get a dbpedia block via the
    // label-keyed Lookup table — the same fallback Stats.linkedShares
    // counts, so the result document and statistics.json agree on which
    // entities are dbpedia-linked
    val joined = dbpediaLookup match {
      case Some(lookup) => joined1.join(
        broadcast(lookup
          .select(col("labelNorm"), col("resourceUri").as("lkUri"),
            col("abstractText").as("lkAbstract"))
          .dropDuplicates("labelNorm")),
        graft.functions.TextFunctions.labelNorm(col("entityName")) === col("labelNorm"),
        "left")
      case None => joined1
        .withColumn("lkUri", lit(null).cast("string"))
        .withColumn("lkAbstract", lit(null).cast("string"))
    }

    joined
      .select(
        col("docId"),
        col("entityName").as("entity"),
        struct(
          col("entityType").as("typ"),
          col("inferred"),
          col("citation"),
          col("firstPos").as("citationStart"),
          col("citationEnd")).as("details"),
        struct(
          when(col("wikipediaTitle").isNotNull, struct(
            (Seq(
              col("wikipediaTitle").as("label"),
              // emitted URLs go through the reference's sanitizer
              // (wiki_url_utils.py:3-14) so special-char titles stay valid
              graft.functions.TextFunctions.sanitizeWikipediaUrl(
                concat(lit("https://en.wikipedia.org/wiki/"),
                  replace(col("wikipediaTitle"), lit(" "), lit("_")))).as("url"),
              col("wikipediaExtract").as("extract"),
              col("categories")) ++ detailFields): _*)).as("wikipedia"),
          when(col("wdQid").isNotNull, struct(
            col("wdQid").as("id"),
            concat(lit("https://www.wikidata.org/wiki/"), col("wdQid")).as("url"),
            col("wdLabel").as("label"),
            col("wdDescription").as("description"),
            col("aliases"),
            col("instanceOf").as("types"),
            col("partOf").as("part_of"),
            col("hasParts").as("has_parts"),
            col("memberOf").as("member_of"),
            col("officialWebsite").as("website"),
            col("coordinates"),
            // raw Wikidata time values trimmed exactly where the reference
            // formats them (wikidata_service.py:506-513)
            graft.functions.TextFunctions.trimWikidataTime(col("birthDate")).as("birth_date"),
            graft.functions.TextFunctions.trimWikidataTime(col("deathDate")).as("death_date"),
            graft.functions.TextFunctions.trimWikidataTime(col("foundingDate")).as("founding_date"),
            col("gndId").as("gnd_id"))).as("wikidata"),
          when(col("dbQid").isNotNull || col("lkUri").isNotNull, struct(
            coalesce(col("resourceUri"), col("lkUri")).as("resource_uri"),
            coalesce(col("abstractText"), col("lkAbstract")).as("abstract"),
            col("dbTypes").as("types"),
            col("subjects"),
            col("dbPartOf").as("part_of"),
            col("dbHasParts").as("has_parts"),
            col("dbMemberOf").as("member_of"))).as("dbpedia")).as("sources"))
  }

  /** Full result document per docId (reference final JSON shape:
   * entities + relationships + statistics keys at the top level). */
  def resultDocuments(packaged: DataFrame, triples: Dataset[Triple]): DataFrame = {
    val ents = packaged.groupBy(col("docId"))
      .agg(collect_list(struct(col("entity"), col("details"), col("sources"))).as("entities"))
    val rels = triples.groupBy(col("docId"))
      .agg(collect_list(struct(
        col("subject"), col("predicate"), col("obj").as("object"),
        col("inferred"), col("subjectType").as("subject_type"),
        col("objectType").as("object_type"))).as("relationships"))
    ents.join(rels, Seq("docId"), "left")
  }
}
