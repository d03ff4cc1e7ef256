package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Interlanguage linking (reference LANGUAGE=de, settings.py:15;
 * translate-first resolution wikipedia_service.py:31-87 and
 * dbpedia_service.py:49-101) + extraction-level type restriction
 * (prompt_utils.py:4-13).
 */
class MultilingualSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  test("labelsForLang resolves de aliases translate-first with langlink fallback") {
    val de = KB.labelsForLang(spark, "de")
      .select($"aliasNorm", $"canonicalTitle", $"qid").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // translated through the langlinks dim: de alias → de title → en title
    assert(de("datenstromverarbeitung") == ("stream processing", "Q9401"))
    assert(de("vektoruhr") == ("vector clock", "Q9403"))
    assert(de("konsensprotokoll") == ("consensus protocol", "Q9404"))
    // proper noun with NO langlink row: local title doubles as canonical
    assert(de("brookfall") == ("Brookfall", "Q9102"))
  }

  test("de-surface corpus links through translation to the SAME qids and names") {
    val deCorpus = Seq(
      SourceFile("org/r0", "doc1.md", "c" * 40, "md",
        "Die Datenstromverarbeitung mit Brookfall nutzt eine Vektoruhr."),
      SourceFile("org/r0", "doc2.md", "d" * 40, "md",
        "Das Konsensprotokoll und die Spaltenspeicherung in Mistgate."))
      .toDS()
    val enCorpus = Seq(
      SourceFile("org/r0", "doc1.md", "c" * 40, "md",
        "The Stream Processing with Brookfall uses a Vector Clock."),
      SourceFile("org/r0", "doc2.md", "d" * 40, "md",
        "The Consensus Protocol and the Columnar Storage in Mistgate."))
      .toDS()
    val deRes = Pipeline.run(spark, deCorpus, PipelineConfig(language = "de"))
    val enRes = Pipeline.run(spark, enCorpus, PipelineConfig(language = "en"))
    def keyed(r: PipelineResult) = r.linked
      .select($"docId", $"entityName", $"qid").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    val deLinked = keyed(deRes)
    val enLinked = keyed(enRes)
    assert(deLinked == enLinked, s"de=$deLinked en=$enLinked")
    assert(deLinked.exists(_._3 == "Q9401")) // stream processing found via de surface
    // downstream adjacency identical too: same canonical triples
    def tset(r: PipelineResult) = r.triples
      .select($"subject", $"predicate", $"obj").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(tset(deRes) == tset(enRes))
    assert(tset(deRes).nonEmpty)
  }

  test("allowed-types restriction happens at extraction: A-C adjacency across disallowed B") {
    // entity order in-document: Brookfall (SOFTWARE), Ingrid Malvik (PERSON),
    // Quartzite (LANGUAGE). With PERSON disallowed, the reference's
    // prompt-level restriction never extracts Malvik, so Brookfall and
    // Quartzite become ADJACENT → "written in" triple. Filtering triples
    // after relate instead would lose that edge (round-2 VERDICT #4).
    val corpus = Seq(
      SourceFile("org/r1", "d.md", "e" * 40, "md",
        "Brookfall was started by Ingrid Malvik using Quartzite."))
      .toDS()
    val res = Pipeline.run(spark, corpus,
      PipelineConfig(allowedTypes = Some(Seq("SOFTWARE", "LANGUAGE"))))
    val triples = res.triples.select($"subject", $"predicate", $"obj").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(triples.contains(("Brookfall", EntityUniverse.PredWrittenIn, "Quartzite")), triples)
    assert(!triples.exists(t => t._1.contains("Malvik") || t._3.contains("Malvik")))
    // and the entity dimension itself carries no disallowed types
    val types = res.docEntities.select($"entityType").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("SOFTWARE", "LANGUAGE")))
  }
}
