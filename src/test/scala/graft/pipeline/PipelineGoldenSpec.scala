package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Golden end-to-end test (SURVEY.md §5): deterministic seed-fixed corpus →
 * full pipeline → compare against fixtures computed FROM THE PLANT PLAN, not
 * from pipeline code. Precision/recall target ≥ 0.95 (BASELINE.json metric);
 * the deterministic design should reach 1.0.
 */
class PipelineGoldenSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  private val seed = 42L
  private val numFiles = 300L
  private val numRepos = 40

  private lazy val corpus = Corpus.generate(spark, numFiles, numRepos, seed, partitions = 8).persist()
  private lazy val result = Pipeline.run(spark, corpus)

  test("per-row content sha256 invariant vs manifest (input_hint)") {
    // regenerate independently at different parallelism; hashes must agree row-for-row
    val m1 = Corpus.manifest(corpus)
    val m2 = Corpus.manifest(Corpus.generate(spark, numFiles, numRepos, seed, partitions = 3))
    assert(m1.count() == numFiles)
    assert(m1.join(m2, Seq("repo", "path", "commit", "sha256"), "inner").count() == numFiles)
  }

  test("linked entities match the plant plan exactly") {
    val got = result.docEntities
      .select($"docId", $"entityName", $"qid", $"entityType")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val want = Corpus.goldenEntities(seed, numFiles, numRepos).toSet
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty, s"missing ${missing.size}: ${missing.take(5)}")
    assert(extra.isEmpty, s"extra ${extra.size}: ${extra.take(5)}")
  }

  test("triples match golden at P/R >= 0.95 (expect 1.0)") {
    val got = result.triples
      .select($"subject", $"predicate", $"obj", $"inferred")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val want = Corpus.goldenFinalTriples(seed, numFiles, numRepos)
    val tp = (got intersect want).size.toDouble
    val precision = if (got.isEmpty) 0.0 else tp / got.size
    val recall = if (want.isEmpty) 0.0 else tp / want.size
    info(f"precision=$precision%.4f recall=$recall%.4f got=${got.size} want=${want.size}")
    assert(precision >= 0.95, s"precision $precision; extra=${(got -- want).take(5)}")
    assert(recall >= 0.95, s"recall $recall; missing=${(want -- got).take(5)}")
  }

  test("ambiguous surface links to the deterministic winner") {
    // every planted bare "Mercury" must resolve to Mercury Queue (exact alias,
    // higher popularity), never Mercury Protocol (synonym alias)
    val mercury = result.linked.filter($"surface" === "Mercury").select($"entityName").distinct().collect()
    assert(mercury.map(_.getString(0)).toSet.subsetOf(Set("Mercury Queue")))
  }

  test("canonicalization: same qid ⇒ same canonical id, distinct qids stay apart") {
    val pairs = result.canonMap.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // every linked title maps to its qid-rooted component deterministically
    val byCanon = pairs.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    // no two distinct qids may share a component (no false merges)
    val qidOf = EntityUniverse.all.map(e => e.title -> e.qid).toMap
    byCanon.values.foreach { titles =>
      val qids = titles.flatMap(qidOf.get)
      assert(qids.size <= 1, s"false merge: $titles -> $qids")
    }
  }

  test("results are identical across shuffle-partition settings (determinism)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val r2 = Pipeline.run(spark, corpus)
      val a = result.triples.select($"subject", $"predicate", $"obj", $"inferred").collect().toSet
      val b = r2.triples.select($"subject", $"predicate", $"obj", $"inferred").collect().toSet
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("kgc rounds add only novel KB-lifted triples with KB-enriched types") {
    val base = result.triples
    val withKgc = Pipeline.kgc(spark, base, KB.wikidata(spark), KB.labels(spark), rounds = 3)
    val added = withKgc.join(base.select("subject", "predicate", "obj"),
      Seq("subject", "predicate", "obj"), "left_anti").as[Triple].collect()
    assert(added.forall(_.inferred == PipelineSchema.InferredImplicit))
    // keys unique after kgc
    val n = withKgc.count()
    val nk = withKgc.select("subject", "predicate", "obj").distinct().count()
    assert(n == nk)
  }

  test("kgc enriches lifted-triple endpoint types from the KB label dimension") {
    // targeted base where the lift is guaranteed novel: Mistgate's KB
    // part-of (Lumina Platform) is absent from the base graph
    val base = Seq(Triple("Mistgate", EntityUniverse.PredUses, "Brookfall",
      PipelineSchema.InferredExplicit, "SOFTWARE", "SOFTWARE",
      PipelineSchema.InferredExplicit, PipelineSchema.InferredExplicit,
      "t1", "md")).toDS()
    val withKgc = Pipeline.kgc(spark, base, KB.wikidata(spark), KB.labels(spark), rounds = 2)
    val added = withKgc.join(base.select("subject", "predicate", "obj"),
      Seq("subject", "predicate", "obj"), "left_anti").as[Triple].collect()
    assert(added.nonEmpty)
    val lifted = added.find(t =>
      t.subject == "Mistgate" && t.predicate == EntityUniverse.PredPartOf &&
        t.obj == "Lumina Platform")
    assert(lifted.nonEmpty, added.toSeq)
    // KB-known endpoints must never carry UNKNOWN
    // (relationship_inference.py:137-142; round-2 VERDICT "What's wrong" #5)
    assert(lifted.get.subjectType == "SOFTWARE" && lifted.get.objectType == "SOFTWARE")
    added.foreach { t =>
      if (EntityUniverse.byTitle.contains(t.subject))
        assert(t.subjectType == EntityUniverse.byTitle(t.subject).entityType, t)
      if (EntityUniverse.byTitle.contains(t.obj))
        assert(t.objectType == EntityUniverse.byTitle(t.obj).entityType, t)
    }
  }

  test("materialize writes deterministic lineage and resume skips completed stage") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mat").toString
    val canon = result.canonicalTriples.toDF()
    assert(Materialize.writeStage(canon, "triples", tmp))
    val first = spark.read.json(s"$tmp/triples/lineage")
      .select("lang", "bucket", "rowCount", "sha256").collect()
      .map(_.toSeq).toSet
    // resume: second call must skip
    assert(!Materialize.writeStage(canon, "triples", tmp))
    // lineage recomputed at different parallelism must be identical
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "9")
      val again = Materialize.lineage(canon, "triples")
        .select("lang", "bucket", "rowCount", "sha256").collect()
        .map(_.toSeq).toSet
      assert(again == first)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
