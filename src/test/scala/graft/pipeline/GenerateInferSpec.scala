package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Generate mode (example_generate_simple.py semantics: same DAG, KB-driven
 * mention source, everything implicit) and implicit entity inference
 * (entity_inference.py: KB-neighbor entities, explicit displaces implicit). */
class GenerateInferSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  test("generate mode: topic -> implicit entities through the same DAG") {
    val topics = Seq(("t1", "stream processing with lumina")).toDF("topicId", "topic")
    val corpus = Generate.corpusFromTopics(topics, KB.labels(spark), maxEntities = 5)
    val docs = corpus.collect()
    assert(docs.length == 1 && docs.head.repo == "generate")

    val result = Pipeline.run(spark, corpus, PipelineConfig(generateMode = true))
    val ents = result.docEntities.collect()
    assert(ents.nonEmpty)
    // generator.py:175: every generated entity is implicit
    assert(ents.forall(_.getAs[String]("inferred") == "implicit"))
    val names = ents.map(_.getAs[String]("entityName")).toSet
    assert(names.contains("stream processing"), names)
    assert(names.exists(_.startsWith("Lumina")), names)
    // relationships flow through the same relate/dedup stages, and carry the
    // implicit entity flags
    val triples = result.triples.collect()
    assert(triples.nonEmpty)
    assert(triples.forall(t => t.subjectInferred == "implicit" && t.objectInferred == "implicit"))

    // generation-mode JSONL sink (generator.py:26-76): user = the topic
    val ex = TrainingData.generationExamples(topics, result.docEntities)
    val rows = ex.select(explode($"messages").as("m")).select($"m.role", $"m.content").collect()
    assert(rows.map(_.getString(0)).toSet == Set("system", "user", "assistant"))
    assert(rows.find(_.getString(0) == "user").get.getString(1) == "stream processing with lumina")
    val assistant = rows.find(_.getString(0) == "assistant").get.getString(1)
    assert(assistant.linesIterator.forall(_.split(";").length >= 4))
  }

  test("implicit entity inference: KB neighbor appears implicit, displaced when explicit") {
    val corpus = spark.createDataset(Seq(
      SourceFile("r", "a", "c", "java", "Mistgate handles the incoming requests."),
      SourceFile("r", "b", "c", "java", "Mistgate runs on the Lumina Platform stack.")))
    val result = Pipeline.run(spark, corpus, PipelineConfig(inferImplicit = true))
    val ents = result.docEntities
      .select("docId", "entityName", "inferred").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // doc a never names Lumina Platform -> inferred from Mistgate's partOf
    assert(ents(("r:a", "Mistgate")) == "explicit")
    assert(ents(("r:a", "Lumina Platform")) == "implicit")
    // doc b names it explicitly -> the explicit row displaces the implicit one
    assert(ents(("r:b", "Lumina Platform")) == "explicit")

    // the lifted KB triple now validates in doc a (both endpoints present)
    val t = result.triples.filter(x => x.docId == "r:a" &&
      x.subject == "Mistgate" && x.obj == "Lumina Platform").collect()
    assert(t.nonEmpty)
    assert(t.head.subjectInferred == "explicit" && t.head.objectInferred == "implicit")
  }

  test("dbpedia lookup fallback: a dim-missing entity still canonicalizes to its URI") {
    // Veldt (Q9003) has NO row in the qid-keyed dbpedia dim — only the
    // label-keyed Lookup table reaches it (KB.dbpediaLookupOnly)
    assert(!KB.dbpediaRows.exists(_.qid == "Q9003"))
    val lookup = KB.dbpediaLookup(spark).collect()
    // JSON/XML full-outer merge: xml homepage wins, json abstract survives
    val v = lookup.find(_.getAs[String]("labelNorm") == "veldt").get
    assert(v.getAs[String]("abstractText").contains("(json)"))
    assert(v.getAs[String]("homepage") == "https://example.org/veldt")

    val corpus = spark.createDataset(Seq(
      SourceFile("r", "v", "c", "java", "Veldt scripts the deployment.")))
    val result = Pipeline.run(spark, corpus)
    val canon = result.canonMap.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // without the fallback the component would be {n:veldt, q:Q9003} -> "n:veldt";
    // the fallback edge pulls in the dbpedia node, whose id is the lexicographic min
    assert(canon("Veldt") == "d:http://dbpedia.example/resource/Veldt")

    // and the statistics count it as dbpedia-linked via the fallback
    val share = Stats.linkedShares(result.docEntities, KB.wikidata(spark),
      KB.dbpedia(spark), Some(KB.dbpediaLookup(spark))).head()
    assert(share.getAs[Long]("dbpedia_count") == 1L)
    val shareNoFallback = Stats.linkedShares(result.docEntities, KB.wikidata(spark),
      KB.dbpedia(spark)).head()
    assert(shareNoFallback.getAs[Long]("dbpedia_count") == 0L)
  }

  test("inference off leaves the entity set unchanged") {
    val corpus = spark.createDataset(Seq(
      SourceFile("r", "a", "c", "java", "Mistgate handles the incoming requests.")))
    val result = Pipeline.run(spark, corpus)
    val names = result.docEntities.select("entityName").collect().map(_.getString(0)).toSet
    assert(names == Set("Mistgate"))
  }
}
