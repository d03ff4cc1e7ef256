package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.Skew

class TextFunctionsSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  test("semicolon entity-line parser drops malformed lines") {
    val df = Seq(
      "Albert Einstein; Person; https://de.wikipedia.org/wiki/Albert_Einstein; der Physiker",
      "broken; line",
      "A; B; C; D; E").toDF("line")
      .select(TextFunctions.parseEntityLine($"line").as("e"))
    val rows = df.collect()
    assert(rows(0).getStruct(0).getString(0) == "Albert Einstein")
    assert(rows(0).getStruct(0).getString(1) == "Person")
    assert(rows(1).isNullAt(0)) // < 4 fields -> dropped (openai_service.py:113)
    assert(rows(2).getStruct(0).getString(3) == "D") // extra fields ignored
  }

  test("triple parser: json array first, semicolon fallback") {
    val json = Seq("""[{"subject":"A","predicate":"uses","object":"B"}]""").toDF("p")
      .select(TextFunctions.parseTripleJson($"p").as("t")).collect()
    assert(json(0).getSeq[org.apache.spark.sql.Row](0).head.getString(1) == "uses")
    val line = Seq("A; part of; B", "nope").toDF("l")
      .select(TextFunctions.parseTripleLine($"l").as("t")).collect()
    assert(line(0).getStruct(0).getString(2) == "B")
    assert(line(1).isNullAt(0))
  }

  test("url validation, title projection, lang extraction") {
    val df = Seq(
      ("https://en.wikipedia.org/wiki/Stream_processing#History", true),
      ("http://de.wikipedia.org/wiki/K%C3%B6ln", true),
      ("https://example.com/wiki/Nope", false)).toDF("url", "want")
      .select($"url", $"want",
        TextFunctions.isValidWikipediaUrl($"url").as("valid"),
        TextFunctions.urlToTitle($"url").as("title"),
        TextFunctions.langFromUrl($"url").as("lang"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getBoolean(2) == r.getBoolean(1), r.getString(0)))
    assert(rows(0).getString(3) == "Stream processing" && rows(0).getString(4) == "en")
    assert(rows(1).getString(3) == "Köln" && rows(1).getString(4) == "de")
  }

  test("malformed percent-escapes do not crash url functions (raw fallback)") {
    // url_decode THROWS on a bare '%'; the safe decode falls back to the
    // undecoded text instead of failing the task on one bad row
    val rows = Seq(
      "https://en.wikipedia.org/wiki/100%_club",
      "https://en.wikipedia.org/wiki/Bad%GGescape").toDF("url")
      .select(TextFunctions.urlToTitle($"url").as("title"),
        TextFunctions.normalizeQuery($"url").as("q"))
      .collect()
    assert(rows(0).getString(0) == "100% club")
    assert(rows(1).getString(0) == "Bad%GGescape")
    assert(rows.forall(r => r.getString(1).nonEmpty))
  }

  test("inferred normalization matches reference semantics") {
    val out = Seq("explizit", "EXPLICIT", "implizit", "whatever")
      .toDF("x").select(TextFunctions.normalizeInferred($"x")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("explicit", "explicit", "implicit", "implicit"))
  }

  test("wikidata time trim, ellipsis strip, clean text, citation span") {
    assert(Seq("+1994-01-27T00:00:00Z").toDF("t")
      .select(TextFunctions.trimWikidataTime($"t")).head().getString(0) == "1994-01-27")
    assert(Seq("too long....", "fine").toDF("t")
      .select(TextFunctions.stripEllipsis($"t")).collect().map(_.getString(0)).toSeq
      == Seq("too long", "fine"))
    assert(Seq("```scala\ncode\n```").toDF("t")
      .select(TextFunctions.cleanText($"t")).head().getString(0).contains("code"))
    val span = Seq(("hello world", "world")).toDF("c", "q")
      .select(TextFunctions.citationSpan($"c", $"q").as("s")).head().getStruct(0)
    assert(span.getInt(0) == 6 && span.getInt(1) == 11)
  }

  test("url sanitizer matches urllib.parse.quote(title, safe=\"_()%-\") semantics") {
    // expectations computed with Python urllib (wiki_url_utils.py:3-14 parity)
    val cases = Seq(
      "https://de.wikipedia.org/wiki/Jürgen Müller"
        -> "https://de.wikipedia.org/wiki/J%C3%BCrgen_M%C3%BCller",
      "https://en.wikipedia.org/wiki/Group (mathematics)"
        -> "https://en.wikipedia.org/wiki/Group_(mathematics)",
      "https://en.wikipedia.org/wiki/C++"
        -> "https://en.wikipedia.org/wiki/C%2B%2B",
      "https://en.wikipedia.org/wiki/50% off"
        -> "https://en.wikipedia.org/wiki/50%_off",
      "https://en.wikipedia.org/wiki/a*b~c.d-e"
        -> "https://en.wikipedia.org/wiki/a%2Ab~c.d-e",
      "https://en.wikipedia.org/wiki/Aya Nakamura-Boone"
        -> "https://en.wikipedia.org/wiki/Aya_Nakamura-Boone",
      "no-wiki-part" -> "no-wiki-part")
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.sanitizeWikipediaUrl($"url")).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, want) => assert(g == want) }
  }
}

class SkewSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  // heavy-hitter distribution: one key owns 80% of rows
  private lazy val skewed = spark.range(10000)
    .select(when($"id" % 5 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id")).as("k"),
      ($"id" % 97).as("v"))

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed.toDF(), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedDistinctCount equals countDistinct") {
    val plain = skewed.groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(skewed.toDF(), Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("byte-identical duplicate rows across partitions spread over salt buckets") {
    // the round-2 salt (hash of row columns only) mapped ALL identical rows
    // to one bucket — a no-op exactly on count-by-key inputs with few
    // columns. With spark_partition_id mixed in, each scan partition gets
    // its own bucket for the duplicated row.
    val dupes = spark.range(8000).repartition(16).select(lit("hot").as("k"), lit(1L).as("v"))
    val buckets = dupes.select(graft.ops.Skew.rowSalt(dupes, 16).as("s"))
      .distinct().count()
    assert(buckets >= 8, s"expected identical rows to spread, got $buckets buckets")
    val counted = Skew.saltedCount(dupes, Seq("k")).collect()
    assert(counted.map(r => r.getString(0) -> r.getLong(1)).toMap == Map("hot" -> 8000L))
  }

  test("saltedCount tolerates unhashable MapType columns") {
    val withMap = skewed.withColumn("m", map(lit("a"), $"v"))
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(withMap.toDF(), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val build = Seq(("hot", 1), ("k5", 2), ("missing", 3)).toDF("k", "tag")
    val plain = skewed.join(build, Seq("k")).groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed.toDF(), build, "k").groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}

class TrainingCompendiumSpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  private lazy val corpus = Corpus.generate(spark, 50L, 5, 42L, 2).persist()
  private lazy val result = Pipeline.run(spark, corpus)

  test("entity training examples are valid JSONL with reference message shape") {
    val ex = TrainingData.entityExamples(corpus, result.docEntities)
    val tmp = java.nio.file.Files.createTempDirectory("graft-train").toString
    TrainingData.write(ex, tmp)
    val back = spark.read.json(tmp)
    assert(back.count() == ex.count() && back.count() > 0)
    val msgs = back.select(explode($"messages").as("m")).select($"m.role", $"m.content")
    val roles = msgs.select("role").distinct().collect().map(_.getString(0)).toSet
    assert(roles == Set("system", "user", "assistant"))
    // assistant lines parse back through the semicolon parser
    val assistant = msgs.filter($"role" === "assistant")
      .select(explode(split($"content", "\n")).as("line"))
      .select(graft.functions.TextFunctions.parseEntityLine($"line").as("e"))
    assert(assistant.filter($"e".isNull).count() == 0)
  }

  test("relation examples round-trip through the triple parser") {
    val ex = TrainingData.relationExamples(corpus, result.triples)
    val lines = ex.select(explode($"messages").as("m"))
      .filter($"m.role" === "assistant")
      .select(explode(split($"m.content", "\n")).as("line"))
      .select(graft.functions.TextFunctions.parseTripleLine($"line").as("t"))
    assert(lines.count() > 0 && lines.filter($"t".isNull).count() == 0)
  }

  test("entity training citations equal the DOCUMENT SPAN, not the entity name") {
    // packaged entities carry the first-occurrence surface as citation
    // (openai_service.py:158-173). The ambiguous plant writes the surface
    // "Mercury" for the entity "Mercury Queue" — extract-from-text fidelity
    // means the training line must cite "Mercury" (round-2 VERDICT #3 of
    // "What's missing" / task 9).
    val packaged = Link.packagedEntities(result.linked, result.docEntities)
    // plan-golden: every packaged citation equals the PLANTED surface span
    // of that entity in that document (computable without the pipeline)
    val expected = (0L until 50L).flatMap { id =>
      val p = Corpus.plan(42L, 50L, 5, id)
      p.plants.map(pl => (s"${p.repo}:${p.path}", pl.title) -> pl.surface)
    }.toMap
    val got = packaged.select($"docId", $"entityName", $"citation").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
    assert(got.nonEmpty)
    got.foreach { case (k, cit) =>
      assert(expected.get(k).contains(cit), s"$k cited '$cit', planted '${expected.get(k)}'")
    }
    // the ambiguity plant writes surface "Mercury" for entity
    // "Mercury Queue" — the JSONL citation must be the document span,
    // not the entity name (openai_service.py:158-173)
    val ambiguous = expected.collect {
      case ((doc, "Mercury Queue"), "Mercury") => doc
    }
    assert(ambiguous.nonEmpty, "no ambiguous Mercury plant in this corpus seed")
    val ex = TrainingData.entityExamples(corpus, packaged)
    val lines = ex.select(explode($"messages").as("m"))
      .filter($"m.role" === "assistant")
      .select(explode(split($"m.content", "\n")).as("line"))
      .select(graft.functions.TextFunctions.parseEntityLine($"line").as("e"))
      .select($"e.name", $"e.citation")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(lines.contains(("Mercury Queue", "Mercury")),
      "JSONL must carry the 'Mercury' span citation for the ambiguous plant")
  }

  test("compendium honors the length budget at sentence boundaries; educational mode framed") {
    val budget = 120
    val comp = Compendium.perDocument(result.linked, lengthBudget = budget)
    val rows = comp.select($"compendium").collect().map(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { c =>
      assert(c.length <= budget, s"over budget: ${c.length}")
      assert(c.endsWith("."), s"not a sentence boundary: ...${c.takeRight(20)}")
    }
    val edu = Compendium.perDocument(result.linked, lengthBudget = 8000,
      educational = true).select($"compendium").head().getString(0)
    assert(edu.startsWith("Overview for learners: "))
  }

  test("compendium: extracts in first-occurrence order, refs deduped order-preserving") {
    val comp = Compendium.perDocument(result.linked)
    val row = comp.orderBy($"docId").head()
    val refs = row.getSeq[String](row.fieldIndex("references"))
    assert(refs.distinct == refs) // order-preserving dedup
    assert(row.getString(row.fieldIndex("compendium")).nonEmpty)
    val numbered = row.getSeq[String](row.fieldIndex("referencesNumbered"))
    assert(numbered.head.startsWith("(1) "))
  }

  test("statistics JSON block has the FULL reference R6 key set") {
    val json = Stats.statisticsJson(result.linked, result.docEntities, result.triples,
      KB.wikidata(spark), KB.dbpedia(spark), Some(KB.dbpediaLookup(spark)))
    // the complete key set of orchestrator.py:483-591 / README.md:110-129
    Seq("total_entities", "types_distribution", "linked", "top_wikipedia_categories",
      "top_wikidata_types", "entity_connections", "top_wikidata_part_of",
      "top_wikidata_has_parts", "top_dbpedia_part_of", "top_dbpedia_has_parts",
      "top_dbpedia_subjects").foreach(k => assert(json.contains("\"" + k + "\""), k))
    // per-source linked blocks with count+percent
    Seq("wikipedia", "wikidata", "dbpedia").foreach(s =>
      assert(json.contains("\"" + s + "\": {\"count\": "), s))
    // must be parseable JSON
    val parsed = spark.read.json(Seq(json).toDS())
    assert(parsed.count() == 1)
    // value sanity: the synthetic KB links every entity to all three sources
    val row = parsed.select($"linked.wikipedia.percent", $"linked.wikidata.percent",
      $"linked.dbpedia.percent").head()
    assert(row.getDouble(0) == 100.0 && row.getDouble(1) == 100.0 && row.getDouble(2) == 100.0)
    // top_wikidata_types mirrors instanceOf values of linked entities
    val ty = parsed.select(explode($"top_wikidata_types").as("t"))
      .select($"t.type").collect().map(_.getString(0))
    assert(ty.contains("programming language") || ty.contains("software library"))
  }
}
