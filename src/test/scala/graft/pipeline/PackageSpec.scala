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
