package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/**
 * Similarity search over an embedding column (`array<float>`):
 * brute-force cosine top-k as the exactness baseline, and an LSH
 * (random-hyperplane) bucketed variant as the scale path — candidates come
 * from same-signature buckets only, so the join volume is n·k' not n².
 *
 * All vector math runs through the codegen Catalyst expressions in
 * [[graft.functions.VectorOps]] (tight primitive loops inside whole-stage
 * codegen). The round-2 `aggregate`/`zip_with` formulation was interpreted
 * (higher-order functions are CodegenFallback) and dominated the bench —
 * q_cosine_pairs spent 91 s on ~1.8 M interpreted 3×O(dim) verifies.
 */
object SimOps {

  /** Persisted intermediates from the pairwise entry points (the normalized
   * vector frame feeds the banding pass AND both verify sides). Same drain
   * contract as [[DedupOps.unpersistIntermediates]]. */
  private val persistedIntermediates =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private def registerPersisted(df: DataFrame): DataFrame = synchronized {
    persistedIntermediates += df
    df
  }

  def unpersistIntermediates(): Unit = synchronized {
    persistedIntermediates.foreach(_.unpersist(false))
    persistedIntermediates.clear()
  }

  /** Σ aᵢ·bᵢ — codegen expression, not an interpreted HOF. */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** v / ‖v‖₂, computed once per row (pairwise verify = one dot). */
  def normalize(a: Column): Column = vec_l2normalize(a)

  /** Brute-force cosine top-k neighbors of a literal query vector.
   * Plans as one narrow projection + TakeOrderedAndProject — a single pass,
   * no shuffle except the final top-k merge. */
  def topKBrute(embeddings: DataFrame, query: Seq[Float], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    embeddings
      .withColumn("sim", round(cosine(col(vecCol).cast("array<double>"), q), 6))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Bit signature of a vector under `nPlanes` deterministic hyperplanes
   * (plane components from a splitmix64 mix of the indices — identical on
   * every executor and across retries; see VectorOps.mix). */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    lsh_signature(vec, nPlanes)

  /**
   * ANN top-k via BANDED random-hyperplane LSH (the standard multi-table
   * E2LSH construction, sharing the lsh_band_sigs codegen kernel with
   * cosineDupPairs): a row is a candidate if ANY of its `bands` band
   * signatures (`rowsPerBand` sign bits each) equals the query's, then exact
   * cosine ranks the candidates.
   *
   * Recall for a neighbor at cosine c: per-bit agreement p = 1 - acos(c)/π,
   * per-band collision q = p^rowsPerBand, recall = 1 - (1-q)^bands — at the
   * defaults (32 × 4) even a weak c = 0.3 neighbor (p ≈ 0.60, q ≈ 0.127) is
   * found with ≈ 0.99; measured 0.994 mean recall@20 over 25 seeded queries
   * on the sf0.1 table, whose 20th neighbors sit at cosine ≈ 0.29
   * (AnnRecallSpec, BASELINE.md). Candidate volume ≈ bands · n /
   * 2^rowsPerBand before overlap — at n = 2000 the 4-bit defaults probe most
   * of the table (there is no sublinear 0.9-recall probe for 20th neighbors
   * at cosine 0.3 on 2k rows); scale rowsPerBand with log n (12-16 bits at
   * n ≥ 10^8) to keep the probe sublinear where sublinearity is possible.
   * Recall < 1 by construction; the quality baseline is topKBrute.
   *
   * Plans as one broadcast semi-join on (band, sig) + a distinct + the
   * exact-rank TakeOrderedAndProject — no shuffle of the embedding table.
   */
  def topKLsh(embeddings: DataFrame, query: Seq[Float], k: Int,
      bands: Int = 32, rowsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val banded = embeddings
      .select(col(idCol), col(vecCol),
        posexplode(lsh_band_sigs(col(vecCol).cast("array<double>"), bands, rowsPerBand)))
      .select(col(idCol), col(vecCol), col("pos").as("band"), col("col").as("sig"))
    val qsigs = embeddings.sparkSession.range(1)
      .select(posexplode(lsh_band_sigs(q, bands, rowsPerBand)))
      .select(col("pos").as("band"), col("col").as("sig"))
    banded.join(broadcast(qsigs), Seq("band", "sig"), "left_semi")
      .select(col(idCol), col(vecCol)).distinct()
      .withColumn("sim", round(cosine(col(vecCol).cast("array<double>"), q), 6))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /**
   * IVF coarse quantizer: deterministic Lloyd iterations over DataFrames.
   * Init = the k lowest-id vectors (reproducible, no RNG); each iteration is
   * one broadcast-join argmin assignment + one (cid, dim) hash-aggregate
   * mean. Centroid count stays dimension-sized, so the index itself is
   * broadcastable at any corpus scale.
   */
  def ivfCentroids(embeddings: DataFrame, k: Int, iterations: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = embeddings.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).persist()
    // dense centroid ids via row_number over the k seed rows: casting the
    // vector id itself to int overflows (ANSI error) or collides for
    // 64-bit ids and nulls out for string ids — the cid is an index, not
    // the id (the window runs on the k-row seed frame, not the corpus)
    var centroids = vecs.orderBy("id").limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("id")).as("cid"), col("v").as("centroid"))
      .localCheckpoint(true)
    (0 until iterations).foreach { _ =>
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
        .localCheckpoint(true) // eager: next round + queries reuse, no lineage growth
    }
    vecs.unpersist()
    centroids
  }

  /** Nearest-centroid assignment via broadcast + argmin over the (small)
   * centroid set. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("d", dot(col("v"), col("centroid"))
        / (l2norm(col("v")) * l2norm(col("centroid"))))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("v")), col("d")).as("b"))
      .select(col("id"), col("b.cid").as("cid"), col("b.v").as("v"))

  /**
   * Build-once IVF index artifact: the coarse centroids plus the per-vector
   * cell assignment, both eagerly materialized. An index is built once and
   * probed many times — rebuilding the quantizer inside every query (the
   * round-1 shape) paid 3 Lloyd iterations per call.
   */
  final case class IvfIndex(centroids: DataFrame, cells: DataFrame) {
    def unpersist(): Unit = cells.unpersist()
  }

  def buildIvfIndex(embeddings: DataFrame, nCentroids: Int = 16,
      iterations: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfIndex = {
    val centroids = ivfCentroids(embeddings, nCentroids, iterations, idCol, vecCol)
    val vecs = embeddings.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cells = assign(vecs, centroids).persist()
    cells.count() // eager: queries start from ready blocks
    IvfIndex(centroids, cells)
  }

  /** IVF top-k against a prebuilt index: probe the `nprobe` centroids
   * nearest to the query, exact cosine rank within their cells only.
   * Recall < 1 by construction; the quality baseline is topKBrute. */
  def topKIvfIndexed(index: IvfIndex, query: Seq[Float], k: Int,
      nprobe: Int = 3, idCol: String = "vec_id"): DataFrame = {
    val q = array(query.map(x => lit(x.toDouble)): _*)
    val probeCids = index.centroids
      .withColumn("d", cosine(q, col("centroid")))
      .orderBy(desc("d")).limit(nprobe)
      .select(col("cid"))
    index.cells.join(broadcast(probeCids), Seq("cid"))
      .withColumn("sim", round(cosine(col("v"), q), 6))
      .select(col("id").as(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** One-shot convenience (build + probe); prefer buildIvfIndex +
   * topKIvfIndexed when issuing more than one query. */
  def topKIvf(embeddings: DataFrame, query: Seq[Float], k: Int,
      nCentroids: Int = 16, nprobe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topKIvfIndexed(buildIvfIndex(embeddings, nCentroids, 3, idCol, vecCol),
      query, k, nprobe, idCol)

  /**
   * Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold):
   * BANDED hyperplane LSH candidates + exact cosine verification.
   *
   * Recall design: a pair at cosine c agrees on one hyperplane bit with
   * p = 1 - acos(c)/π; a band of r bits collides with q = p^r. Requiring at
   * least `minBandHits` of the b band collisions (the hit count falls out of
   * the same aggregation that dedupes candidate pairs, so it is free):
   * P(miss) = Σ_{i<minBandHits} C(b,i)·qⁱ·(1-q)^(b-i). At the defaults
   * (32 bands × 8 bits, minBandHits = 2) and c = 0.95 (p ≈ 0.899,
   * q = p⁸ ≈ 0.427): P(miss) ≈ 5e-7, and 0 for exact duplicates (all bands
   * agree) — effectively lossless, so the verified output equals brute force
   * (asserted vs in-Spark brute force at two SFs by SimOpsSpec and vs the
   * DuckDB brute-force oracle by the driver).
   *
   * Candidate-volume design (the round-2 scale-killer — 91 s, 46% of the
   * driver bench): join volume per random pair is b·(1/2)^r and the verify
   * set is pairs with ≥ minBandHits collisions. Round-2 (16×6, ≥1) measured
   * at sf0.1: 2.26 M join rows → 1.91 M verified pairs. This form (32×8,
   * ≥2): 1.0 M join rows → 84 k verified pairs — a 23× cut in O(dim)
   * verifies, while P(miss) at the threshold IMPROVES 1.2e-4 → 5e-7
   * (8-bit bands collide 4× less on noise, and two of 32 longer bands
   * beat one of 16 short ones on signal).
   *
   * Verification is ONE codegen dot per pair: vectors are L2-normalized once
   * in the base projection (the round-2 form recomputed both norms per pair
   * — three interpreted O(dim) aggregates per candidate).
   */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      bands: Int = 32, rowsPerBand: Int = 8, minBandHits: Int = 2,
      bucketCap: Int = 100000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // persisted: this projection (full scan + per-row L2 normalize) feeds
    // the banding pass AND both verify sides — unpersisted it would run
    // three times per call (caller drains via unpersistIntermediates)
    val vecs = registerPersisted(embeddings.select(col(idCol).as("id"),
      normalize(col(vecCol).cast("array<double>")).as("v")).persist())
    // band signatures in one codegen pass per row (sign bits are
    // scale-invariant, so signatures of normalized vectors equal raw ones)
    val bandedAll = vecs
      .select(col("id"), posexplode(lsh_band_sigs(col("v"), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band"), col("col").as("sig"))
    // bucket-size cap (the same SparkER-style blocking-key valve as
    // jaccardPairs.dfCap): a (band, sig) bucket of m ids costs m²/2 join
    // rows, and on CLUSTERED embedding corpora — the norm, not the
    // exception — a dense cluster's intra-cluster pairs all share buckets,
    // growing candidates with Σ cluster². Over-cap buckets are TRUNCATED to
    // their first `bucketCap` ids (not dropped: a cluster larger than the
    // cap shares one bucket per band across ALL bands, so dropping whole
    // buckets silently yields ZERO pairs for exactly the heaviest duplicate
    // clusters). The truncation order is a hash of the id alone — the SAME
    // prefix of a uniform cluster survives in every band, so the kept
    // members form a full candidate clique with all-band collision counts
    // and pass minBandHits; a band-dependent order would spread survival
    // thin and defeat the ≥2-band rule. Join volume is bounded at
    // bands·cap²/2 per bucket regardless of cluster structure; the recall
    // cost is local and observable (overCapBuckets below): members ranked
    // past the cap in every one of their buckets lose detection, but the
    // cluster itself is always detected through its kept prefix. The
    // default cap is lossless on the driver data; size it to executor
    // memory at the target scale.
    val bucketW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("sig"))
      .orderBy(xxhash64(col("id")), col("id"))
    val banded = bandedAll
      .withColumn("rn", row_number().over(bucketW))
      .filter(col("rn") <= bucketCap)
      .select(col("id"), col("band"), col("sig"))
    // the (band, sig)-bucketed self-join streams candidate id pairs; the
    // groupBy both DEDUPES (a, b) and counts band collisions map-side —
    // the minBandHits filter is free
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= math.min(minBandHits, bands))
      .select(col("a"), col("b"))
    val va = vecs.select(col("id").as("a"), col("v").as("va"))
    val vb = vecs.select(col("id").as("b"), col("v").as("vb"))
    candidates.join(va, Seq("a")).join(vb, Seq("b"))
      .select(col("a"), col("b"), round(dot(col("va"), col("vb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /**
   * Embedding near-duplicate CLUSTERS: connected components over the
   * [[cosineDupPairs]] graph with the canonical representative elected as
   * the min vec id per component — the cluster → keep-one step after pair
   * generation, mirroring [[graft.ops.DedupOps.nearDupClusters]] for the
   * embedding modality (cosine similarity is not transitive either: a~b,
   * b~c at ≥t with cos(a,c) < t must still collapse to ONE survivor).
   * Output: (vec_id, cluster_id, is_canonical) for every vector on ≥ 1
   * near-dup edge. Scale shape: the edge set is bounded by the banded-LSH
   * candidate valve (bands·bucketCap²/2); components are propagated
   * dimension-only over the CLUSTERED vectors, not the corpus
   * ([[graft.pipeline.Canonicalize.connectedComponents]]). */
  def cosineDupClusters(embeddings: DataFrame, threshold: Double = 0.95,
      bands: Int = 32, rowsPerBand: Int = 8, minBandHits: Int = 2,
      bucketCap: Int = 100000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val edges = cosineDupPairs(embeddings, threshold, bands, rowsPerBand,
        minBandHits, bucketCap, idCol, vecCol)
      .select(col("a").as("src"), col("b").as("dst"))
    graft.pipeline.Canonicalize.electClusters(edges, idCol)
  }

  /** Observability companion to [[cosineDupPairs]]: the (band, sig) buckets
   * whose size exceeds `bucketCap` — i.e. exactly the buckets the candidate
   * join truncates. Empty result ⇒ the cap was lossless on this input; a
   * non-empty result quantifies where recall can be lost (run it alongside
   * the dedup job and alert/log on count > 0 at production scale). */
  def overCapBuckets(embeddings: DataFrame, bands: Int = 32, rowsPerBand: Int = 8,
      bucketCap: Int = 100000, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol).as("id"),
        posexplode(lsh_band_sigs(
          normalize(col(vecCol).cast("array<double>")), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band"), col("col").as("sig"))
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") > bucketCap)
}
