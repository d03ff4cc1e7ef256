package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * In-memory KB fixture tables derived from [[EntityUniverse]].
 *
 * Replace the reference's per-entity HTTP calls with broadcastable dimension
 * tables (SURVEY.md §2.1): the alias index replaces the Wikipedia
 * opensearch/redirect/synonym fallback cascade (reference:
 * entityextractor/services/wikipedia_service.py:139-266), the wikidata table
 * replaces get_wikidata_details (wikidata_service.py:338-676), the dbpedia
 * table replaces the SPARQL star query (dbpedia_service.py:219-515).
 *
 * At 100 TB corpus scale these stay dimension-sized (a real Wikidata label
 * index is ~100M rows / a few GB — still broadcastable or at worst a
 * shuffle-free bucketed build side), which is why every lookup in the
 * pipeline is a broadcast hash join, never a shuffle.
 */
object KB {

  /** Alias-kind priority for deterministic link scoring: exact beats redirect
   * beats synonym (mirrors the reference's short-circuit fallback order,
   * linker.py:63-121). */
  def kindPriority(kind: String): Int = kind match {
    case "exact" => 0
    case "redirect" => 1
    case _ => 2
  }

  def labelRows: Seq[KbLabel] =
    EntityUniverse.all.flatMap { e =>
      def row(alias: String, kind: String) = KbLabel(
        aliasNorm = EntityUniverse.norm(alias),
        canonicalTitle = e.title,
        qid = e.qid,
        aliasKind = kind,
        entityType = e.entityType,
        popularity = e.popularity,
        lang = "en",
        extract = s"${e.title} is a synthetic ${e.entityType.toLowerCase} entity (${e.instanceOf.mkString(", ")}).",
        categories = e.categories)
      e.exactAliases.map(row(_, "exact")) ++
        e.redirectAliases.map(row(_, "redirect")) ++
        e.synonymAliases.map(row(_, "synonym"))
    }

  def wikidataRows: Seq[KbWikidata] =
    EntityUniverse.all.map { e =>
      KbWikidata(
        qid = e.qid,
        label = e.title,
        description = s"synthetic ${e.instanceOf.headOption.getOrElse("entity")}",
        aliases = (e.exactAliases ++ e.redirectAliases ++ e.synonymAliases),
        instanceOf = e.instanceOf,
        subclassOf = Nil,
        partOf = e.partOf,
        hasParts = EntityUniverse.all.filter(_.partOf.contains(e.title)).map(_.title),
        memberOf = e.memberOf,
        officialWebsite = s"https://example.org/${e.title.toLowerCase.replace(' ', '-')}")
    }

  def dbpediaRows: Seq[KbDbpedia] =
    EntityUniverse.all.map { e =>
      KbDbpedia(
        resourceUri = s"http://dbpedia.example/resource/${e.title.replace(' ', '_')}",
        qid = e.qid,
        label = e.title,
        abstractText = s"${e.title} — synthetic abstract.",
        types = e.instanceOf,
        subjects = e.categories.map("Category:" + _),
        partOf = e.partOf,
        hasParts = EntityUniverse.all.filter(_.partOf.contains(e.title)).map(_.title),
        memberOf = e.memberOf)
    }

  /** Keywords marking maintenance categories to drop from statistics
   * (same role as the reference's keyword list, category_utils.py:3-165;
   * list re-authored, not copied). */
  val maintenanceKeywords: Seq[String] = Seq(
    "stub", "disambiguation", "maintenance", "articles with", "pages with",
    "cleanup", "wikidata", "cs1", "redirects", "all articles", "tracking",
    "hidden", "use dmy", "use mdy", "webarchive", "infobox", "missing",
    "unreferenced", "orphaned", "deprecated")

  def labels(spark: SparkSession): Dataset[KbLabel] = {
    import spark.implicits._
    spark.createDataset(labelRows)
  }

  def wikidata(spark: SparkSession): Dataset[KbWikidata] = {
    import spark.implicits._
    spark.createDataset(wikidataRows)
  }

  def dbpedia(spark: SparkSession): Dataset[KbDbpedia] = {
    import spark.implicits._
    spark.createDataset(dbpediaRows)
  }
}
