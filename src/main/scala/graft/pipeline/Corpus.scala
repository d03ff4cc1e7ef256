package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic synthetic source-code corpus (no external data, seed-fixed).
 *
 * Stands in for the 10^12-file Iceberg source-code table of BASELINE.json
 * `input_hint` (columns repo, path, commit, lang, content). Entity surfaces
 * from [[EntityUniverse]] are planted into comments/doc-strings at known
 * positions, so the expected mention/link/triple sets are computable from the
 * plant plan alone — the golden fixtures the pipeline is scored against
 * (SURVEY.md §5; the reference ships recorded cache blobs instead,
 * /root/reference/entityextractor/cache/README.md:1-5).
 *
 * Generation is fully distributed: each row derives from its id via a
 * deterministic PRNG, so the same (seed, numFiles, id) always yields the same
 * row on any executor — which also makes the per-row sha2(content,256)
 * manifest invariant reproducible at any parallelism.
 */
object Corpus {

  val Langs: Seq[String] = Seq("java", "py", "scala", "go", "md")

  /** Fraction of files owned by the single deliberately hot repo (skew). */
  val HotRepoShare = 0.15
  val HotRepoName = "org/mega-repo-0000"

  final case class Plant(title: String, qid: String, entityType: String, surface: String)

  final case class FilePlan(
      id: Long,
      repo: String,
      path: String,
      commit: String,
      lang: String,
      plants: Seq[Plant])

  private def rng(seed: Long, id: Long): java.util.Random =
    new java.util.Random(seed * 1000003L + id * 7919L)

  /** Display form of a lowercase alias, as planted into content. */
  def display(alias: String): String =
    alias.split(' ').map(w => if (w.isEmpty) w else w.head.toUpper + w.tail).mkString(" ")

  /** Pure plant plan for file `id` — shared by the generator and the golden
   * fixture computation in tests. */
  def plan(seed: Long, numFiles: Long, numRepos: Int, id: Long): FilePlan = {
    val r = rng(seed, id)
    val hotFiles = (numFiles * HotRepoShare).toLong
    val repo =
      if (id < hotFiles) HotRepoName
      else f"org/repo-${(id % math.max(1, numRepos)).toInt}%04d"
    val lang = Langs(r.nextInt(Langs.size))
    val ext = lang match {
      case "py" => "py"; case "md" => "md"; case "go" => "go"
      case "scala" => "scala"; case _ => "java"
    }
    val path = f"src/module${r.nextInt(40)}%02d/File$id%06d.$ext"
    val commit = f"${seed * 31 + id}%040x".takeRight(40)

    // 2..4 distinct regular entities
    val pool = new scala.util.Random(r).shuffle(EntityUniverse.entities)
    val k = 2 + r.nextInt(3)
    var chosen = pool.take(k)
    // hot/skew entity in ~half of all files
    if (r.nextDouble() < 0.5) chosen = chosen :+ EntityUniverse.hotEntity
    // ambiguous surface "mercury" in ~10% of files (links to Mercury Queue by
    // the deterministic score; exercises window-argmax disambiguation)
    val withAmbig =
      if (r.nextDouble() < 0.10 && !chosen.exists(_.qid == "Q9501"))
        chosen.map(e => Plant(e.title, e.qid, e.entityType, display(e.exactAliases.head))) :+
          Plant("Mercury Queue", "Q9501", "SOFTWARE", "Mercury")
      else chosen.map(e => Plant(e.title, e.qid, e.entityType, display(e.exactAliases.head)))
    FilePlan(id, repo, path, commit, lang, withAmbig)
  }

  /** Render file content from a plan. All entity surfaces appear inside the
   * leading doc-comment block; the body filler deliberately avoids every
   * gazetteer alias token so the plant plan IS the expected mention set. */
  def render(p: FilePlan): String = {
    val surf = p.plants.map(_.surface)
    val sentences = new StringBuilder
    surf.sliding(2).foreach {
      case Seq(a, b) => sentences.append(s" * $a interacts with $b in this module.\n")
      case Seq(a) => sentences.append(s" * $a is configured here.\n")
      case _ =>
    }
    sentences.append(s" * Overview: ${surf.mkString(", ")}.\n")
    val doc = p.lang match {
      case "py" =>
        "\"\"\"\n" + sentences.toString.replace(" * ", "") + "\"\"\"\n"
      case "md" =>
        "# Module notes\n\n" + sentences.toString.replace(" * ", "- ") + "\n"
      case "go" =>
        sentences.toString.replace(" * ", "// ")
      case _ =>
        "/**\n" + sentences.toString + " */\n"
    }
    val body = p.lang match {
      case "py" =>
        s"""
           |import os
           |
           |def handle_request(ctx, payload):
           |    window = ctx.open_window(payload)
           |    return window.finalize()
           |""".stripMargin
      case "md" =>
        "\n## Usage\n\nRun the module pipeline with the standard runner.\n"
      case "go" =>
        s"""
           |package module
           |
           |func HandleRequest(ctx Context, payload []byte) error {
           |\treturn ctx.Dispatch(payload)
           |}
           |""".stripMargin
      case _ =>
        s"""
           |package modules;
           |
           |public class Handler$$${p.id % 97} {
           |  private final long windowMillis = ${p.id % 9000L + 1000L};
           |  public int dispatch(int payloadSize) {
           |    return payloadSize + (int) (windowMillis % 13);
           |  }
           |}
           |""".stripMargin
    }
    s"// commit ${p.commit} path ${p.path}\n" + doc + body
  }

  /** Distributed corpus generation. */
  def generate(spark: SparkSession, numFiles: Long, numRepos: Int = 200,
      seed: Long = 42L, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, numFiles, 1L, partitions).map { id =>
      val p = plan(seed, numFiles, numRepos, id)
      SourceFile(p.repo, p.path, p.commit, p.lang, render(p))
    }
  }

  /** Materialize the corpus as a parquet table (the stand-in for the Iceberg
   * source table) and return a reader. Generation garbage stays out of the
   * measured pipeline, and the input becomes a real columnar scan —
   * identical bytes for every parallelism level reading it. */
  def materialize(spark: SparkSession, dir: String, numFiles: Long,
      numRepos: Int = 200, seed: Long = 42L, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    val marker = java.nio.file.Paths.get(dir, "_GRAFT_CORPUS_OK")
    // Decouple the on-disk file layout from the WRITER's parallelism: a
    // 2-core session writing `partitions`=4 files of one ~40 MB row group
    // each caps every later scan at 4 tasks (parquet can't split inside a
    // row group), silently serializing the narrow detect→link chain for
    // any wider session that reads the table — measured as scaling
    // efficiency 0.52 instead of ~1.0 at 2 vs 8 cores. Fix the file count
    // to the corpus size (~30k rows ≈ 2.5 MB per file) with a floor of 64
    // (≥ the widest local session, so small corpora still fan out across
    // local[32]) — exactly like sizing files on a production table.
    val nOutFiles = math.max(64, (numFiles / 30000L).toInt)
    // The marker records the LAYOUT, not just the row count: a corpus
    // materialized by pre-fix code (writer-parallelism layout) or with a
    // different target file count must regenerate, or the stale layout
    // silently reintroduces the row-group scan cap this sizing exists to fix.
    // seed + numRepos INCLUDED: a corpus regenerated with different plan
    // parameters at the same size must not be silently reused (the goldens
    // are computed from the plan, not the files)
    val markerContent = java.util.Arrays.asList(
      "layout=v2", s"numFiles=$numFiles", s"nOutFiles=$nOutFiles",
      s"seed=$seed", s"numRepos=$numRepos")
    val upToDate = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readAllLines(marker) == markerContent
    if (!upToDate) {
      generate(spark, numFiles, numRepos, seed, partitions)
        .repartition(nOutFiles)
        .write.mode("overwrite").parquet(s"$dir/corpus")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(marker, markerContent)
    }
    spark.read.parquet(s"$dir/corpus").as[SourceFile]
  }

  /** Manifest with the per-row integrity hash (input_hint invariant). */
  def manifest(corpus: Dataset[SourceFile]): Dataset[ManifestRow] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    corpus.select($"repo", $"path", $"commit", sha2($"content", 256).as("sha256"))
      .as[ManifestRow]
  }

  // ------------------------------------------------------------------
  // Golden fixtures (computed from the plan, NOT by running the pipeline)
  // ------------------------------------------------------------------

  def docId(repo: String, path: String): String = s"$repo:$path"

  /** Expected linked-entity set per file: (docId, title, qid, entityType). */
  def goldenEntities(seed: Long, numFiles: Long, numRepos: Int): Seq[(String, String, String, String)] =
    (0L until numFiles).flatMap { id =>
      val p = plan(seed, numFiles, numRepos, id)
      p.plants.map(pl => (docId(p.repo, p.path), pl.title, pl.qid, pl.entityType))
    }.distinct

  /** Expected triple set (distinct over the corpus, explicit > implicit),
   * mirroring the reference's dedup semantics (orchestrator.py:63-72). */
  def goldenTriples(seed: Long, numFiles: Long, numRepos: Int): Set[(String, String, String, String)] = {
    val perDoc = (0L until numFiles).flatMap { id =>
      val p = plan(seed, numFiles, numRepos, id)
      docTriples(p.plants)
    }
    // explicit wins over implicit on the same (s,p,o) key
    perDoc.groupBy(t => (t._1, t._2, t._3)).map { case (_, ts) =>
      ts.find(_._4 == PipelineSchema.InferredExplicit).getOrElse(ts.head)
    }.toSet
  }

  /** The pair-consolidation semantics applied to a plan-computed triple set:
   * per undirected pair, greedy-cluster predicates by Ratcliff/Obershelp ≥
   * 0.85 in the pinned total order and keep the first of each cluster —
   * dissimilar predicates between the same pair (e.g. an explicit "uses"
   * plus an implicit "part of") ALL survive, exactly the reference's
   * per-semantic-group keep (deduplication_utils.py:12-87). A one-per-pair
   * reduction here would be WRONG — caught by ScaleKbSpec, where random type
   * assignment makes the multi-predicate pair case common. */
  def consolidateGolden(triples: Set[(String, String, String, String)]): Set[(String, String, String, String)] =
    triples.groupBy { case (s, _, o, _) => if (s <= o) (s, o) else (o, s) }
      .flatMap { case (_, ts) =>
        val rels = ts.toVector.sortBy { case (s, p, o, inf) =>
          (if (inf == PipelineSchema.InferredExplicit) 0 else 1, p.length, p, s, o)
        }
        val kept = scala.collection.mutable.ArrayBuffer[(String, String, String, String)]()
        rels.foreach { r =>
          if (!kept.exists(k => RatcliffObershelp.ratio(k._2, r._2) >= 0.85)) kept += r
        }
        kept
      }.toSet

  /** Golden set after the full dedup chain: exact (explicit>implicit) then
   * per-undirected-pair cluster consolidation ([[consolidateGolden]]).
   * Computed from the plan, independently of the pipeline. */
  def goldenFinalTriples(seed: Long, numFiles: Long, numRepos: Int): Set[(String, String, String, String)] =
    consolidateGolden(goldenTriples(seed, numFiles, numRepos))

  // ------------------------------------------------------------------
  // Scaled corpus: plants from SyntheticKb, 10-50 entities per file
  // (round-3 VERDICT #1/#2 — exercise the KB dimension at 10^5+ aliases and
  // make triples/sec a real metric: the toy corpus yielded 207 distinct
  // triples from 2M files, so relate/dedup/CC carried ~zero bench weight)
  // ------------------------------------------------------------------

  val ScaledMinPlants = 10
  val ScaledMaxPlants = 30

  /** Pure scaled plant plan for file `id`: UP TO k ∈ [ScaledMinPlants,
   * ScaledMaxPlants] distinct entities from an m-entity [[SyntheticKb]]
   * (k indices are drawn with replacement then de-duplicated, so collisions
   * can leave fewer — negligible at kbSize ≥ 10^4, visible at toy sizes),
   * plus the hot entity (index 0) in ~half of all files (skew, as in the
   * toy plan). Shared by the generator and the golden fixtures. */
  def planScaled(seed: Long, numFiles: Long, numRepos: Int, kbSize: Long, id: Long): FilePlan = {
    val r = rng(seed, id)
    val hotFiles = (numFiles * HotRepoShare).toLong
    val repo =
      if (id < hotFiles) HotRepoName
      else f"org/repo-${(id % math.max(1, numRepos)).toInt}%04d"
    val lang = Langs(r.nextInt(Langs.size))
    val ext = lang match {
      case "py" => "py"; case "md" => "md"; case "go" => "go"
      case "scala" => "scala"; case _ => "java"
    }
    val path = f"src/module${r.nextInt(40)}%02d/File$id%06d.$ext"
    val commit = f"${seed * 31 + id}%040x".takeRight(40)
    val k = ScaledMinPlants + r.nextInt(ScaledMaxPlants - ScaledMinPlants + 1)
    var idxs = Seq.fill(k)((r.nextDouble() * kbSize).toLong).distinct
    if (r.nextDouble() < 0.5 && !idxs.contains(0L)) idxs = idxs :+ 0L
    val plants = idxs.map { i =>
      val s = SyntheticKb.spec(i, kbSize)
      Plant(s.title, s.qid, s.entityType, s.title) // surface = full title
    }
    FilePlan(id, repo, path, commit, lang, plants)
  }

  /** Distributed scaled-corpus generation (same renderer as the toy plan). */
  def generateScaled(spark: SparkSession, numFiles: Long, kbSize: Long,
      numRepos: Int = 200, seed: Long = 42L, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, numFiles, 1L, partitions).map { id =>
      val p = planScaled(seed, numFiles, numRepos, kbSize, id)
      SourceFile(p.repo, p.path, p.commit, p.lang, render(p))
    }
  }

  /** Materialized scaled corpus table (layout discipline as [[materialize]]:
   * file count fixed by data size, marker records layout + KB size). */
  def materializeScaled(spark: SparkSession, dir: String, numFiles: Long, kbSize: Long,
      numRepos: Int = 200, seed: Long = 42L, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    // scaled rows are ~3x the toy rows (10-30 planted surfaces per doc
    // comment), so ~10k rows ≈ 2.5 MB per file
    val nOutFiles = math.max(64, (numFiles / 10000L).toInt)
    val marker = java.nio.file.Paths.get(dir, "_GRAFT_CORPUS_OK")
    val markerContent = java.util.Arrays.asList(
      "layout=v2-scaled", s"numFiles=$numFiles", s"kbSize=$kbSize", s"nOutFiles=$nOutFiles",
      s"seed=$seed", s"numRepos=$numRepos")
    val upToDate = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readAllLines(marker) == markerContent
    if (!upToDate) {
      generateScaled(spark, numFiles, kbSize, numRepos, seed, partitions)
        .repartition(nOutFiles)
        .write.mode("overwrite").parquet(s"$dir/corpus")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(marker, markerContent)
    }
    spark.read.parquet(s"$dir/corpus").as[SourceFile]
  }

  /** Expected linked-entity set per file for the scaled plan. */
  def goldenEntitiesScaled(seed: Long, numFiles: Long, numRepos: Int,
      kbSize: Long): Seq[(String, String, String, String)] =
    (0L until numFiles).flatMap { id =>
      val p = planScaled(seed, numFiles, numRepos, kbSize, id)
      p.plants.map(pl => (docId(p.repo, p.path), pl.title, pl.qid, pl.entityType))
    }.distinct

  /** Per-document triples for a scaled plan: explicit adjacency by type rule
   * + implicit KB partOf among co-present entities (the scaled analog of
   * [[docTriples]], with partOf coming from [[SyntheticKb]] group heads). */
  def docTriplesScaled(plants: Seq[Plant], kbSize: Long): Seq[(String, String, String, String)] = {
    val explicit = plants.sliding(2).toSeq.flatMap {
      case Seq(a, b) =>
        EntityUniverse.cooccurrencePredicate(a.entityType, b.entityType)
          .map(pred => (a.title, pred, b.title, PipelineSchema.InferredExplicit))
          .orElse(EntityUniverse.cooccurrencePredicate(b.entityType, a.entityType)
            .map(pred => (b.title, pred, a.title, PipelineSchema.InferredExplicit)))
          .toSeq
      case _ => Nil
    }
    val titles = plants.map(_.title).toSet
    val implicits = plants.flatMap { pl =>
      val idx = pl.qid.stripPrefix("Q").toLong - 1000000L
      SyntheticKb.spec(idx, kbSize).partOfTitle.filter(titles)
        .map(t => (pl.title, EntityUniverse.PredPartOf, t, PipelineSchema.InferredImplicit))
    }
    explicit ++ implicits
  }

  /** Golden distinct triple set for a scaled corpus (explicit > implicit on
   * the same key — the exact-dedup semantics). */
  def goldenTriplesScaled(seed: Long, numFiles: Long, numRepos: Int,
      kbSize: Long): Set[(String, String, String, String)] = {
    val perDoc = (0L until numFiles).flatMap { id =>
      val p = planScaled(seed, numFiles, numRepos, kbSize, id)
      docTriplesScaled(p.plants, kbSize)
    }
    perDoc.groupBy(t => (t._1, t._2, t._3)).map { case (_, ts) =>
      ts.find(_._4 == PipelineSchema.InferredExplicit).getOrElse(ts.head)
    }.toSet
  }

  /** Golden scaled set after the full dedup chain ([[consolidateGolden]]). */
  def goldenFinalTriplesScaled(seed: Long, numFiles: Long, numRepos: Int,
      kbSize: Long): Set[(String, String, String, String)] =
    consolidateGolden(goldenTriplesScaled(seed, numFiles, numRepos, kbSize))

  /** Golden scaled set AFTER KGC rounds (Pipeline.kgc semantics over the
   * SyntheticKb group structure, computed from the plan): each round lifts
   * (member, partOf, groupHead) for every entity name already in the KG —
   * same-document presence NOT required, unlike Relate.implicitTriples. The
   * loop converges after one productive round here: the only KB rel edges
   * are member→head, heads have none, and round-1 objects (heads) therefore
   * generate no round-2 candidates — so this golden is exact for any
   * kgcRounds ≥ 1. Note KGC can RE-ADD a (member, partOf, head) key that
   * pair-consolidation dropped in favor of a similar explicit predicate;
   * the replay below reproduces that by anti-joining on the CONSOLIDATED
   * key set, exactly as Pipeline.kgc does. */
  def goldenKgcTriplesScaled(seed: Long, numFiles: Long, numRepos: Int,
      kbSize: Long): Set[(String, String, String, String)] = {
    val base = goldenFinalTriplesScaled(seed, numFiles, numRepos, kbSize)
    val keys = base.map(t => (t._1, t._2, t._3))
    val known = base.flatMap(t => Seq(t._1, t._3))
    val novel = known.flatMap { name =>
      val idx = name.substring(name.lastIndexOf(' ') + 1).toLong // title = "W1 W2 idx"
      SyntheticKb.spec(idx, kbSize).partOfTitle
        .map(h => (name, EntityUniverse.PredPartOf, h, PipelineSchema.InferredImplicit))
    }.filterNot(t => keys((t._1, t._2, t._3)))
    base ++ novel
  }

  /** Deterministic relation rules for one document's planted entities:
   * explicit = adjacent co-occurrence pairs by type rule (replacing the
   * reference's relation LLM call, relationship_inference.py:217-232);
   * implicit = KB part-of/member-of relations among the doc's entities
   * (mirroring Wikidata P361/P463 lifting, wikidata_service.py:609-649). */
  def docTriples(plants: Seq[Plant]): Seq[(String, String, String, String)] = {
    val dedup = plants.distinct
    val explicit = dedup.sliding(2).toSeq.flatMap {
      case Seq(a, b) =>
        EntityUniverse.cooccurrencePredicate(a.entityType, b.entityType)
          .map(pred => (a.title, pred, b.title, PipelineSchema.InferredExplicit))
          .orElse(EntityUniverse.cooccurrencePredicate(b.entityType, a.entityType)
            .map(pred => (b.title, pred, a.title, PipelineSchema.InferredExplicit)))
          .toSeq
      case _ => Nil
    }
    val titles = dedup.map(_.title).toSet
    val implicits = dedup.flatMap { pl =>
      val spec = EntityUniverse.byTitle(pl.title)
      spec.partOf.filter(titles).map(t => (pl.title, EntityUniverse.PredPartOf, t, PipelineSchema.InferredImplicit)) ++
        spec.memberOf.filter(titles).map(t => (pl.title, EntityUniverse.PredMemberOf, t, PipelineSchema.InferredImplicit))
    }
    explicit ++ implicits
  }
}
