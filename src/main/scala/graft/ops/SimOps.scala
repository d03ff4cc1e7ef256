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
   * Deterministic pseudo-random hyperplanes: component j of plane p is a
   * hash-derived value in [-1, 1]. Same construction on every executor —
   * no RNG state, resume-safe.
   */
  private def hyperplane(p: Int, dim: Int): Column =
    array((0 until dim).map { j =>
      (hash(lit(p * 16384 + j)).cast("double") / Int.MaxValue.toDouble)
    }.map(e => e): _*)

  /** Bit signature of a vector under `nPlanes` hyperplanes. */
  def lshSignature(vec: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { p =>
      when(dot(vec, hyperplane(p, dim)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

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

  /** IVF top-k: probe the `nprobe` centroids nearest to the query, exact
   * cosine rank within their cells only. Recall < 1 by construction; the
   * quality baseline is topKBrute. */
  def topKIvf(embeddings: DataFrame, query: Seq[Float], k: Int,
      nCentroids: Int = 16, nprobe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCentroids, 3, idCol, vecCol)
    val vecs = embeddings.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cells = assign(vecs, centroids)
    val q = array(query.map(x => lit(x.toDouble)): _*)
    val probeCids = centroids
      .withColumn("d", cosine(q, col("centroid")))
      .orderBy(desc("d")).limit(nprobe)
      .select(col("cid"))
    cells.join(broadcast(probeCids), Seq("cid"))
      .withColumn("sim", round(cosine(col("v"), q), 6))
      .select(col("id").as(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

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
    val bandSigs = (0 until bands).map { b =>
      val bits = (0 until rowsPerBand).map { r =>
        val p = b * rowsPerBand + r
        when(dot(col("v"), hyperplane(p, d)) >= 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bits.as("sig"))
    }
    val banded = vecs.select(col("id"), col("v"),
        explode(array(bandSigs: _*)).as("bs"))
      .select(col("id"), col("v"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    // verify on the raw candidate stream, dedup (a,b) AFTER the filter:
    // the per-candidate dot product is codegen'd and cheap, so recomputing
    // it for a pair that collides in k bands beats shuffling array columns
    // through a distinct — the final dedup moves only (a, b, sim) survivors
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        round(cosine(col("l.v"), col("r.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** Embedding width from a single-row probe; fails fast on an empty input
   * (an unknowable dim means every downstream signature would be wrong). */
  def probeDim(embeddings: DataFrame, vecCol: String): Int = {
    val rows = embeddings.select(size(col(vecCol)).as("d")).head(1)
    require(rows.nonEmpty, s"cannot derive embedding dim: no rows in input")
    rows.head.getInt(0)
  }
}
