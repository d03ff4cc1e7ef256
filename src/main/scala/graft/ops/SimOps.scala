package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 * brute-force cosine top-k as the exactness baseline, and an LSH
 * (random-hyperplane) bucketed variant as the scale path — candidates come
 * from same-signature buckets only, so the join volume is n·k' not n².
 * Dot products are pure Catalyst (`zip_with` + `aggregate`), codegen'd.
 */
object SimOps {

  /** Σ aᵢ·bᵢ as a Catalyst expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

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

  /**
   * Deterministic pseudo-random hyperplane component (p, j) in [-1, 1] via a
   * splitmix64-style mix — pure function of the indices, computed DRIVER-side
   * and shipped as literals. Same values on every executor and across task
   * retries; no RNG state, resume-safe.
   *
   * Literals matter for plan size: the previous formulation built each
   * component as a hash() expression — 96 planes × 64 dims = 6144 expression
   * nodes for Catalyst to fold and Janino to compile on EVERY plan, measured
   * as multi-second planning overhead per query at tiny data sizes.
   */
  private def mix(p: Int, j: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  /** All `nPlanes` hyperplanes as ONE literal array<array<double>> — the
   * per-plane dot products run as a runtime loop (`transform`) over constant
   * data instead of an unrolled per-plane expression forest. */
  private def hyperplanesLit(nPlanes: Int, dim: Int): Column =
    array((0 until nPlanes).map(p =>
      array((0 until dim).map(j => lit(mix(p, j))): _*)): _*)

  /** Per-plane sign bits (0/1) of a vector under `nPlanes` hyperplanes. */
  def planeBits(vec: Column, nPlanes: Int, dim: Int): Column =
    transform(hyperplanesLit(nPlanes, dim),
      pl => when(dot(vec, pl) >= 0, lit(1L)).otherwise(lit(0L)))

  private def powersOf2(n: Int): Column = array((0 until n).map(p => lit(1L << p)): _*)

  /** Bit signature of a vector under `nPlanes` hyperplanes. */
  def lshSignature(vec: Column, nPlanes: Int, dim: Int): Column =
    aggregate(
      zip_with(planeBits(vec, nPlanes, dim), powersOf2(nPlanes), (b, p) => b * p),
      lit(0L), (acc, v) => acc + v)

  /**
   * ANN top-k via random-hyperplane LSH: probe = the query's bucket plus all
   * buckets within Hamming distance 1 (multi-probe), then exact cosine rank
   * within candidates. Recall < 1 by construction; the baseline for quality
   * checks is topKBrute.
   */
  def topKLsh(embeddings: DataFrame, query: Seq[Float], k: Int,
      nPlanes: Int = 12, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = query.length
    val sigd = embeddings.withColumn("sig",
      lshSignature(col(vecCol).cast("array<double>"), nPlanes, dim))
    val q = array(query.map(v => lit(v.toDouble)): _*)
    // query signature + multi-probe neighbors, computed as a literal-free plan:
    // one row from a 1-row DF, crossJoin-broadcast onto the bucketed table
    val qsig = sigd.sparkSession.range(1).select(
      lshSignature(q, nPlanes, dim).as("qsig"),
      q.as("qvec"))
    val probes = qsig.select(explode(concat(
      array(col("qsig")),
      array((0 until nPlanes).map(p => col("qsig").bitwiseXOR(lit(1L << p))): _*)
    )).as("sig"), col("qvec"))
    sigd.join(broadcast(probes), Seq("sig"))
      .withColumn("sim", round(cosine(col(vecCol).cast("array<double>"), col("qvec")), 6))
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
    var centroids = vecs.orderBy("id").limit(k)
      .select(col("id").cast("int").as("cid"), col("v").as("centroid"))
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
   * Recall design (same discipline as DedupOps.minhashDupPairs): a pair at
   * cosine c agrees on one hyperplane bit with p = 1 - acos(c)/π; a band of
   * r bits collides with p^r, and the pair is a candidate unless ALL b bands
   * miss: P(miss) = (1 - p^r)^b. At the defaults (16 bands × 6 bits) and
   * c = 0.95 (p ≈ 0.899): P(miss) ≈ 6e-6 — effectively lossless, so the
   * verified output equals brute force while the join stays bucketed.
   *
   * `dim` is derived from the data (one single-row probe) unless supplied —
   * a hardcoded dim silently null-pads `zip_with` on mismatched embeddings
   * and collapses every signature to one bucket.
   */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      bands: Int = 16, rowsPerBand: Int = 6, dim: Int = -1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(embeddings, vecCol)
    val vecs = embeddings.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      // compute ALL plane bits once per row, then slice per band
      .withColumn("bits", planeBits(col("v"), bands * rowsPerBand, d))
    val bandSigs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        aggregate(
          zip_with(slice(col("bits"), b * rowsPerBand + 1, rowsPerBand),
            powersOf2(rowsPerBand), (x, p) => x * p),
          lit(0L), (acc, v) => acc + v).as("sig"))
    }
    val banded = vecs.select(col("id"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    // candidate ids FIRST, vectors later: clustered embeddings make every
    // sub-threshold intra-cluster pair collide in ~several bands, so the
    // same (a, b) shows up k times — dedupe the (a, b) id stream (narrow,
    // two longs) BEFORE fetching vectors and paying the O(dim) verify once
    // per pair (measured 14x on the clustered driver embeddings vs
    // verify-then-distinct)
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val va = vecs.select(col("id").as("a"), col("v").as("va"))
    val vb = vecs.select(col("id").as("b"), col("v").as("vb"))
    candidates.join(va, Seq("a")).join(vb, Seq("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding width from a single-row probe; fails fast on an empty input
   * (an unknowable dim means every downstream signature would be wrong). */
  def probeDim(embeddings: DataFrame, vecCol: String): Int = {
    val rows = embeddings.select(size(col(vecCol)).as("d")).head(1)
    require(rows.nonEmpty, s"cannot derive embedding dim: no rows in input")
    rows.head.getInt(0)
  }
}
