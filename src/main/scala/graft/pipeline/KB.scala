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
      // R7 detail claims, deterministic functions of the (synthetic) qid —
      // same role as P569/P570/P571/P625/P227 in the reference
      val num = e.qid.stripPrefix("Q").toLong
      val isPerson = e.entityType == "PERSON"
      val isOrg = e.entityType == "ORGANIZATION"
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
        officialWebsite = s"https://example.org/${e.title.toLowerCase.replace(' ', '-')}",
        coordinates = if (isOrg) Coordinates(35.0 + (num % 100) * 0.3,
          -120.0 + (num % 180) * 0.7) else null,
        birthDate = if (isPerson)
          f"+19${50 + num % 40}%02d-${1 + num % 12}%02d-${1 + num % 28}%02dT00:00:00Z"
          else null,
        deathDate = if (isPerson && num % 3 == 0)
          f"+20${num % 20}%02d-${1 + num % 12}%02d-${1 + num % 28}%02dT00:00:00Z"
          else null,
        foundingDate = if (isOrg) s"+${1950 + num % 70}-01-01T00:00:00Z" else null,
        gndId = if (isPerson || isOrg) s"1$num-${num % 10}" else null)
    }

  /** ADDITIONAL_DETAILS dim (wikipedia_service.py:514-603): infobox map,
   * see-also neighbors, main image — derived from the entity universe. */
  def wikipediaDetailsRows: Seq[KbWikipediaDetails] =
    EntityUniverse.all.map { e =>
      KbWikipediaDetails(
        title = e.title,
        infobox = Map(
          "type" -> e.entityType.toLowerCase,
          "instance_of" -> e.instanceOf.mkString(", ")) ++
          (if (e.partOf.nonEmpty) Map("part_of" -> e.partOf.mkString(", ")) else Map.empty),
        seeAlso = (e.partOf ++ e.memberOf ++
          EntityUniverse.all.filter(_.partOf.contains(e.title)).map(_.title)).distinct,
        image = s"https://example.org/img/${e.title.replace(' ', '_')}.png")
    }

  def wikipediaDetails(spark: SparkSession): Dataset[KbWikipediaDetails] = {
    import spark.implicits._
    spark.createDataset(wikipediaDetailsRows)
  }

  /** Entities with NO row in the qid-keyed DBpedia dim — reachable only via
   * the label-keyed Lookup fallback (dbpedia_service.py:103-197). Models the
   * real-world dim gap the reference's fallback exists for. */
  val dbpediaLookupOnly: Set[String] = Set("Q9003") // Veldt

  def dbpediaRows: Seq[KbDbpedia] =
    EntityUniverse.all.filterNot(e => dbpediaLookupOnly(e.qid)).map { e =>
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

  // ---- interlanguage support (reference LANGUAGE=de, settings.py:15) ----

  /** Langlinks dimension (fromLang, titleFrom, toLang, titleTo), both
   * directions — the broadcastable stand-in for the Wikipedia langlinks API
   * the reference calls per title (wikipedia_service.py:31-87
   * get_wikipedia_title_in_language). Entities without a de title have no
   * row, exactly like a missing langlink. */
  def langLinks(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    EntityUniverse.deTitles.toSeq.flatMap { case (en, de) =>
      Seq(("en", en, "de", de), ("de", de, "en", en))
    }.toDF("fromLang", "titleFrom", "toLang", "titleTo")
  }

  /** Language-LOCAL alias rows for `lang`: aliases resolve to the LOCAL
   * canonical title (what that language's Wikipedia resolves to), before any
   * translation. For entities with no localized title the en title doubles
   * as the local one (proper nouns share titles across wikis). */
  /** Fixture languages with local surfaces. A language outside this set
   * must fail loudly: the old fallthrough served GERMAN surfaces labeled as
   * the requested language and a langlinks filter that matched nothing, so
   * e.g. --language=fr silently mis-linked every localized entity. */
  val SupportedLanguages: Set[String] = Set("en", "de")

  def labelRowsLocal(lang: String): Seq[KbLabel] = {
    require(SupportedLanguages.contains(lang),
      s"unsupported pipeline language '$lang' — fixture KB carries ${SupportedLanguages.mkString("/")}")
    if (lang == "en") labelRows
    else EntityUniverse.all.flatMap { e =>
      val localTitle = EntityUniverse.deTitles.getOrElse(e.title, e.title)
      val aliases = (localTitle +:
        EntityUniverse.deAliases.getOrElse(e.title, Nil)).distinct
      aliases.zipWithIndex.map { case (alias, i) =>
        KbLabel(
          aliasNorm = EntityUniverse.norm(alias),
          canonicalTitle = localTitle,
          qid = e.qid,
          aliasKind = if (i == 0) "exact" else "synonym",
          entityType = e.entityType,
          popularity = e.popularity,
          lang = lang,
          extract = s"$localTitle ist ein synthetischer Eintrag (${e.instanceOf.mkString(", ")}).",
          categories = e.categories)
      }
    }
  }

  /**
   * TRANSLATE-FIRST alias index for a configured pipeline language
   * (mirrors wikipedia_service.py:31-87 and the dbpedia translate-first
   * branch, dbpedia_service.py:49-101): resolve the alias in the local
   * language, then translate the local canonical title to English through
   * the langlinks dimension — one broadcast lookup join — falling back to
   * the local title when no langlink exists. Downstream stages (wikidata by
   * qid, DBpedia by English label, canonicalization) then behave exactly as
   * in the English pipeline, which IS the reference's strategy: translate
   * the title, then query the English endpoints. */
  def labelsForLang(spark: SparkSession, lang: String): Dataset[KbLabel] = {
    import spark.implicits._
    require(SupportedLanguages.contains(lang),
      s"unsupported pipeline language '$lang' — fixture KB carries ${SupportedLanguages.mkString("/")}")
    if (lang == "en") labels(spark)
    else {
      import org.apache.spark.sql.functions._
      val local = spark.createDataset(labelRowsLocal(lang))
      val links = langLinks(spark)
        .filter(col("fromLang") === lang && col("toLang") === "en")
        .select(col("titleFrom"), col("titleTo"))
      local.join(broadcast(links), local("canonicalTitle") === links("titleFrom"), "left")
        .withColumn("canonicalTitle", coalesce(col("titleTo"), col("canonicalTitle")))
        .drop("titleFrom", "titleTo")
        .as[KbLabel]
    }
  }

  def wikidata(spark: SparkSession): Dataset[KbWikidata] = {
    import spark.implicits._
    spark.createDataset(wikidataRows)
  }

  def dbpedia(spark: SparkSession): Dataset[KbDbpedia] = {
    import spark.implicits._
    spark.createDataset(dbpediaRows)
  }

  // ---- DBpedia Lookup fallback source (dbpedia_service.py:103-197) ----
  // The reference's fallback queries the Lookup API by entity label and gets
  // TWO partial answers (JSON and XML endpoints), merged per-field by URI
  // with XML taking precedence (dbpedia_service.py:152-170). The two raw
  // variants below are deliberately partial/overlapping so the merge is real.

  def dbpediaLookupJson(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    EntityUniverse.all.filter(e => dbpediaLookupOnly(e.qid)).map { e =>
      (EntityUniverse.norm(e.title),
        s"http://dbpedia.example/resource/${e.title.replace(' ', '_')}",
        s"${e.title} — lookup abstract (json).",
        null.asInstanceOf[String])
    }.toDF("labelNorm", "resourceUri", "abstractText", "homepage")
  }

  def dbpediaLookupXml(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    EntityUniverse.all.filter(e => dbpediaLookupOnly(e.qid)).map { e =>
      (EntityUniverse.norm(e.title),
        s"http://dbpedia.example/resource/${e.title.replace(' ', '_')}",
        null.asInstanceOf[String],
        s"https://example.org/${e.title.toLowerCase}")
    }.toDF("labelNorm", "resourceUri", "abstractText", "homepage")
  }

  /** Merged label-keyed Lookup table: full-outer join by URI + per-column
   * coalesce with the XML variant overwriting the JSON one — the exact merge
   * shape of dbpedia_service.py:152-170 (oracled generically as
   * q_full_outer_merge). Dimension-sized; consumers broadcast it. */
  def dbpediaLookup(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val json = dbpediaLookupJson(spark).select(
      col("resourceUri"), col("labelNorm").as("jLabel"),
      col("abstractText").as("jAbstract"), col("homepage").as("jHomepage"))
    val xml = dbpediaLookupXml(spark).select(
      col("resourceUri"), col("labelNorm").as("xLabel"),
      col("abstractText").as("xAbstract"), col("homepage").as("xHomepage"))
    json.join(xml, Seq("resourceUri"), "full_outer")
      .select(
        coalesce(col("xLabel"), col("jLabel")).as("labelNorm"),
        col("resourceUri"),
        coalesce(col("xAbstract"), col("jAbstract")).as("abstractText"),
        coalesce(col("xHomepage"), col("jHomepage")).as("homepage"))
  }
}
