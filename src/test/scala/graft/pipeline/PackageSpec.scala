package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PackageSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  private lazy val corpus = Corpus.generate(spark, 60L, 5, 42L, 2).persist()
  private lazy val result = Pipeline.run(spark, corpus)
  private lazy val packaged = Package.packagedEntities(
    result.linked, result.docEntities, KB.wikidata(spark), KB.dbpedia(spark)).persist()

  test("lookup-only entities get a dbpedia block when the Lookup fallback is passed") {
    // Veldt's qid is deliberately absent from the qid-keyed dbpedia dim and
    // reachable only via the label-keyed Lookup table — without the fallback
    // the result document said "no DBpedia source" while statistics.json
    // (which counts the same fallback) said dbpedia-linked
    val noFallback = packaged.filter($"entity" === "Veldt")
      .select($"sources.dbpedia").collect()
    val withFallback = Package.packagedEntities(
        result.linked, result.docEntities, KB.wikidata(spark), KB.dbpedia(spark),
        dbpediaLookup = Some(KB.dbpediaLookup(spark)))
      .filter($"entity" === "Veldt")
      .select($"sources.dbpedia.resource_uri", $"sources.dbpedia.abstract").collect()
    assert(noFallback.nonEmpty && noFallback.forall(_.isNullAt(0)))
    assert(withFallback.nonEmpty && withFallback.forall(r =>
      r.getString(0) != null && r.getString(0).contains("dbpedia") &&
        r.getString(1) != null))
  }

  test("packaged entities carry exact citation spans into document text") {
    val byDoc = corpus.collect().map(f => Corpus.docId(f.repo, f.path) -> f.content).toMap
    val rows = packaged.select($"docId", $"details.citation",
      $"details.citationStart", $"details.citationEnd").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val content = byDoc(r.getString(0))
      val cited = content.substring(r.getInt(2), r.getInt(3))
      assert(cited == r.getString(1), s"span mismatch in ${r.getString(0)}")
    }
  }

  test("sources blocks are populated for linked entities (R5 shape)") {
    val row = packaged.filter($"entity" === "Brookfall").head()
    val sources = row.getStruct(row.fieldIndex("sources"))
    val wikipedia = sources.getStruct(0)
    assert(wikipedia.getString(0) == "Brookfall") // label
    assert(wikipedia.getString(1).startsWith("https://en.wikipedia.org/wiki/"))
    val wikidata = sources.getStruct(1)
    assert(wikidata.getString(0) == "Q9102") // id
    val dbpedia = sources.getStruct(2)
    assert(dbpedia.getString(0).contains("/resource/Brookfall"))
  }

  test("R7 details + ADDITIONAL_DETAILS: trimmed dates, coordinates, gnd, infobox") {
    val mini = spark.createDataset(Seq(SourceFile("r", "p", "c", "java",
      "Ingrid Malvik works at Halverson Systems on Brookfall and Mistgate.")))
    val res = Pipeline.run(spark, mini)
    val det = Package.packagedEntities(res.linked, res.docEntities,
      KB.wikidata(spark), KB.dbpedia(spark), Some(KB.wikipediaDetails(spark))).persist()

    // person: birth_date trimmed to YYYY-MM-DD, gnd present, no death claim
    val ingrid = det.filter($"entity" === "Ingrid Malvik")
      .select($"sources.wikidata.birth_date", $"sources.wikidata.death_date",
        $"sources.wikidata.gnd_id").head()
    assert(ingrid.getString(0) == "1971-02-06")
    assert(ingrid.isNullAt(1))
    assert(ingrid.getString(2) == "19301-1")

    // organization: founding date trimmed + coordinates struct
    val halverson = det.filter($"entity" === "Halverson Systems")
      .select($"sources.wikidata.founding_date",
        $"sources.wikidata.coordinates.latitude",
        $"sources.wikidata.coordinates.longitude").head()
    assert(halverson.getString(0) == "1981-01-01")
    assert(math.abs(halverson.getDouble(1) - 35.3) < 1e-9)
    assert(math.abs(halverson.getDouble(2) - (-105.3)) < 1e-9)

    // ADDITIONAL_DETAILS block appended to the wikipedia struct
    val b = det.filter($"entity" === "Mistgate").head()
    val wiki = b.getStruct(b.fieldIndex("sources")).getStruct(0)
    assert(wiki.schema.fieldNames.toSeq ==
      Seq("label", "url", "extract", "categories", "infobox", "see_also", "image"))
    val infobox = wiki.getAs[scala.collection.Map[String, String]]("infobox")
    assert(infobox("type") == "software" && infobox("part_of") == "Lumina Platform")
    assert(wiki.getAs[scala.collection.Seq[String]]("see_also").contains("Lumina Platform"))
    assert(wiki.getAs[String]("image").endsWith("Mistgate.png"))

    // without the flag the wikipedia struct keeps the lean 4-field shape
    val plain = packaged.filter($"entity" === "Brookfall").head()
    assert(plain.getStruct(plain.fieldIndex("sources")).getStruct(0)
      .schema.fieldNames.toSeq == Seq("label", "url", "extract", "categories"))
  }

  test("result documents aggregate entities + relationships per doc") {
    val docs = Package.resultDocuments(packaged, result.triples)
    val row = docs.head()
    assert(row.getSeq[Any](row.fieldIndex("entities")).nonEmpty)
    assert(docs.count() == packaged.select("docId").distinct().count())
    // JSON-serializable end to end (the reference's output is one JSON doc)
    val json = docs.toJSON.take(1).head
    assert(json.contains("\"entities\"") )
  }
}
