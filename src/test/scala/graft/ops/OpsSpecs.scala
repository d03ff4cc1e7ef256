package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("tokenCount and fingerprint") {
    val d = docs(1L -> "  Hello,  World! hello ", 2L -> "a b c")
    val out = d.select($"doc_id", TextOps.tokenCount($"text").as("n"),
      TextOps.fingerprint($"text").as("fp")).collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) == 3 && out(1).getInt(1) == 3)
    // same normalized content => same fingerprint
    val d2 = docs(1L -> "hello world hello", 2L -> "HELLO world HELLO!!")
    val fps = d2.select(TextOps.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("langId picks the dominant stopword language, und when none") {
    val d = docs(
      1L -> "the cat and the dog of the house",
      2L -> "der hund und die katze und das haus",
      3L -> "le chat et la maison et les chiens",
      4L -> "qqq www zzz")
    val out = d.select($"doc_id", TextOps.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("quality features are bounded and deterministic") {
    val d = docs(1L -> ("word " * 50).trim)
    val q = TextOps.quality(d).collect().head
    assert(q.getAs[Int]("n_tokens") == 50)
    val score = q.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }
}

class DedupOpsSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon zeta eta iota"), // near dup of 1
    (4L, "one two three four five six seven eight"),
    (5L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exactClusters finds the identical pair only") {
    val c = DedupOps.exactClusters(base).collect()
    assert(c.length == 1 && c.head.getAs[Long]("cluster_id") == 1L
      && c.head.getAs[Long]("cluster_size") == 2L)
  }

  test("jaccardPairs finds exact and near duplicates above threshold") {
    val pairs = DedupOps.jaccardPairs(base, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // docs 1-2 identical (J=1.0); 1-3 and 2-3 share 5 of 7 shingles (J=5/7≈0.7143)
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.head._3 == 1.0)
  }

  test("nearDupClusters closes non-transitive pair chains into one cluster") {
    // 10~11 (J=0.5) and 11~12 (J=0.5) but 10!~12 (J=0.2): the pair list
    // alone would keep both 10 and 12; the component must merge all three
    val chain = Seq(
      (10L, "a b c d e f g h"),
      (11L, "c d e f g h i j"),
      (12L, "e f g h i j k l"),
      (13L, "m n o p q r s t") // isolated: no edge, so NOT in the output
    ).toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairs(chain, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)), "chain premise")
    val clusters = DedupOps.nearDupClusters(chain, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters == Set((10L, 10L, true), (11L, 10L, false), (12L, 10L, false)))
  }

  test("minhash-LSH verified pairs equal brute-force jaccard pairs") {
    val brute = DedupOps.jaccardPairs(base, n = 3, threshold = 0.5)
      .select("a", "b", "jaccard").collect().toSet
    val lsh = DedupOps.minhashDupPairs(base, n = 3, threshold = 0.5)
      .select("a", "b", "jaccard").collect().toSet
    assert(lsh == brute)
  }

  test("simhashPairs: identical docs at hamming 0, unrelated docs excluded") {
    val p = DedupOps.simhashPairs(base, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue()))
    assert(p.exists(x => x._1 == 1L && x._2 == 2L && x._3 == 0L))
    assert(!p.exists(x => x._2 == 5L || x._1 == 5L))
  }

  test("simhash wide aggregate equals the exploded bit-vote formulation") {
    // the round-2 exploded form is reconstructed here as the semantic oracle
    // for the single-pass wide aggregate (32 conditional sums per id)
    val docs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val tok = docs.select(col("doc_id").as("id"),
      explode(TextOps.tokens(TextOps.normalized(col("text")))).as("w"))
      .withColumn("hv", hash(col("w")))
    val exploded = tok.select(col("id"), col("hv"),
        explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("vote",
        when(expr("shiftright(hv, bit)").bitwiseAND(1) === 1, 1).otherwise(-1))
      .groupBy("id", "bit").agg(sum("vote").as("v"))
      .groupBy("id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, bit)")).otherwise(0L)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = DedupOps.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide == exploded)
    assert(wide.nonEmpty)
  }

  test("portable-hash simhash: banded pairs equal brute force (pigeonhole at hamming<=3)") {
    // With 4 bands and maxHamming=3 every qualifying pair shares at least
    // one clean band, so the banded join must equal all-pairs brute force —
    // the property the DuckDB q_simhash_pairs oracle relies on. Run on the
    // sf0.001 documents table for non-trivial collision structure.
    val docs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val sh = DedupOps.simhash(docs, tokenHash = TextOps.portableHash32)
    val brute = sh.as("l").join(sh.as("r"), col("l.id") < col("r.id"))
      .filter(bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))) <= 3)
      .select(col("l.id"), col("r.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = DedupOps.simhashPairs(docs, maxHamming = 3,
        tokenHash = TextOps.portableHash32)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
    // portable hash must be a genuine 32-bit value (md5 prefix), not murmur
    val hv = docs.select(TextOps.portableHash32(lit("alpha")).as("h")).head().getLong(0)
    assert(hv == java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("alpha".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16))
  }

  test("dropExactDuplicates keeps the smallest id") {
    val kept = DedupOps.dropExactDuplicates(base).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }
}

class SimOpsSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  private def vecs = {
    // deterministic unit-ish vectors in 8 dims
    val rows = (0 until 200).map { i =>
      val r = new scala.util.Random(i * 7919)
      (i.toLong, Array.fill(8)(r.nextGaussian().toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k: self is the top hit with sim 1.0") {
    val v = vecs
    val q = v.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val top = SimOps.topKBrute(v, q, k = 5).collect()
    assert(top.head.getLong(0) == 0L && math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    // descending similarity
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("banded LSH top-k recall@10 >= 0.6 vs brute force on gaussian data") {
    val v = vecs.cache()
    val q = v.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val brute = SimOps.topKBrute(v, q, k = 10).collect().map(_.getLong(0)).toSet
    val lsh = SimOps.topKLsh(v, q, k = 10).collect().map(_.getLong(0)).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(s"lsh recall@10 = $recall")
    assert(lsh.contains(0L)) // the query's own row collides in every band
    assert(recall >= 0.6) // gaussian data is the hard case; real embeddings cluster
  }

  test("IVF top-k: clustered real embeddings give recall@10 >= 0.7 vs brute force") {
    val e = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val q = e.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0)
    val brute = SimOps.topKBrute(e, q, k = 10).collect().map(_.getLong(0)).toSet
    val ivf = SimOps.topKIvf(e, q, k = 10, nCentroids = 16, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"ivf recall@10 = $recall")
    assert(recall >= 0.7)
  }

  test("cosineDupPairs finds planted near-identical vectors") {
    val planted = vecs.unionByName(
      vecs.filter($"vec_id" === 7)
        .select(lit(9999L).as("vec_id"), $"embedding"))
    val pairs = SimOps.cosineDupPairs(planted, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((7L, 9999L)))
  }

  test("cosineDupPairs equals brute force on planted duplicates at two SFs") {
    // mirrors the driver's q_cosine_pairs exactly (planted shifted copy,
    // threshold 0.95, default banding + >=2-band-hit rule) — the LSH plan
    // must reproduce the full brute-force pair set, values included
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val e = graft.SparkTestBase.spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val planted = e.unionByName(
        e.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
      val got = SimOps.cosineDupPairs(planted, threshold = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val v = planted.select($"vec_id".as("id"),
        SimOps.normalize($"embedding".cast("array<double>")).as("v"))
      val brute = v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b"),
          round(SimOps.dot(col("l.v"), col("r.v")), 6).as("sim"))
        .filter($"sim" >= 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute, s"$dir: got ${got.size} vs brute ${brute.size}")
      assert(brute.nonEmpty, s"$dir brute oracle empty — vacuous test")
    }
  }

  test("cosineDupPairs bucketCap bounds candidates: subset out, exact dups survive a tight cap") {
    val e = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = e.unionByName(
      e.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
    val full = SimOps.cosineDupPairs(planted, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap far below the cluster bucket sizes: output must stay a SUBSET
    // (capping only removes candidates, never fabricates pairs), and the
    // planted exact duplicates — which collide in every band — must retain
    // >= minBandHits small-bucket collisions and survive
    val capped = SimOps.cosineDupPairs(planted, threshold = 0.95, bucketCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full))
    val exactDups = planted.select($"vec_id").collect().map(_.getLong(0))
      .filter(_ < 1000000L).map(id => (id, id + 1000000L)).toSet
    val kept = (capped intersect exactDups).size.toDouble / exactDups.size
    info(s"exact-dup survival under cap=50: $kept")
    assert(kept >= 0.9, s"exact dups should survive a tight bucket cap, kept=$kept")
  }

  test("a near-dup cluster LARGER than bucketCap still yields pairs (truncate, not drop)") {
    // 120 exact copies of one vector: every one of its (band, sig) buckets
    // has >= 120 members, all over a cap of 20. Whole-bucket dropping (the
    // pre-round-4 behavior) yields ZERO pairs here — the heaviest duplicate
    // cluster was exactly the one that silently skipped dedup. Truncation
    // keeps a consistent 20-member prefix per bucket, which forms a full
    // candidate clique with all-band hit counts.
    val one = vecs.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0)
    val cluster = (0 until 120).map(i => (5000L + i, one)).toDF("vec_id", "embedding")
    val all = vecs.unionByName(cluster)
    val pairs = SimOps.cosineDupPairs(all, threshold = 0.99, bucketCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clusterIds = (Set(3L) ++ (0 until 120).map(i => 5000L + i)).toSet
    val clusterPairs = pairs.filter { case (a, b) => clusterIds(a) && clusterIds(b) }
    info(s"cluster pairs under cap=20: ${clusterPairs.size}")
    assert(clusterPairs.nonEmpty,
      "over-cap cluster must still be detected through its truncated prefix")
    // the kept prefix is capped per bucket (non-cluster band colliders can
    // shift it slightly between bands), so pair volume stays bounded near
    // cap^2/2 — far below the untruncated 121*120/2 = 7260
    assert(clusterPairs.size <= 1000, s"pair volume not bounded: ${clusterPairs.size}")
    // recall loss is observable: every cluster bucket reports over-cap
    val over = SimOps.overCapBuckets(all, bucketCap = 20).collect()
    assert(over.nonEmpty && over.forall(_.getAs[Long]("m") >= 120L))
  }

  test("cosineDupClusters: non-transitive a~b~c chain collapses to ONE cluster") {
    // a = cos15°·e0 + sin15°·e1, b = e0, c = cos15°·e0 − sin15°·e1:
    // cos(a,b) = cos(b,c) = cos15° ≈ 0.966 ≥ 0.95 but
    // cos(a,c) = cos30° ≈ 0.866 < 0.95 — the pair set alone keeps BOTH a
    // and c; cluster election must collapse all three to min-id 9001
    val c15 = math.cos(math.toRadians(15)).toFloat
    val s15 = math.sin(math.toRadians(15)).toFloat
    def v8(x: Float, y: Float): Seq[Float] = Seq(x, y) ++ Seq.fill(6)(0f)
    val rows = Seq(
      (9001L, v8(c15, s15)), (9002L, v8(1f, 0f)), (9003L, v8(c15, -s15)))
      .toDF("vec_id", "embedding")
    val pairs = SimOps.cosineDupPairs(rows, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((9001L, 9002L), (9002L, 9003L)), s"chain edges: $pairs")
    val clusters = SimOps.cosineDupClusters(rows, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(clusters == Set(
      (9001L, 9001L, true), (9002L, 9001L, false), (9003L, 9001L, false)))
  }
}

class SimilarityJoinSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import org.apache.spark.sql.DataFrame

  /** brute-force within-block RO join — the reference semantics the blocked
   * plan must reproduce exactly. */
  private def brute(names: DataFrame, threshold: Double): Set[(Long, Long, Double)] =
    names.as("l").join(names.as("r"),
        col("l.p_brand") === col("r.p_brand") && col("l.p_partkey") < col("r.p_partkey"))
      .withColumn("sim",
        graft.functions.GraftFunctions.ro_sim(col("l.p_name"), col("r.p_name")))
      .filter(col("sim") >= threshold)
      .select(col("l.p_partkey").as("a"), col("r.p_partkey").as("b"),
        round(col("sim"), 4).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("token-blocked RO join equals brute force within-brand at two SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val part = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      val blocked = SimilarityJoin.roSelfJoin(part, "p_partkey", "p_name", Seq("p_brand"), 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = brute(part, 0.8)
      assert(blocked == want, s"$dir: ${blocked.size} vs brute ${want.size}")
      assert(want.nonEmpty, s"$dir produced an empty oracle — test is vacuous")
    }
  }

  test("single-token spelling variants meet via char-3-gram blocking keys") {
    import spark.implicits._
    // "firebrick" vs "firebrik" share no whitespace token — the round-2
    // token-only blocking silently dropped such pairs (ADVICE r2, medium)
    val rows = Seq(
      (1L, "firebrick", "B1"), (2L, "firebrik", "B1"),
      (3L, "alpha beta", "B1"), (4L, "unrelated", "B2"))
      .toDF("p_partkey", "p_name", "p_brand")
    val out = SimilarityJoin.roSelfJoin(rows, "p_partkey", "p_name", Seq("p_brand"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("df cap drops only capped-token-dependent pairs (lossless at default)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha beta gamma", "B1"), (2L, "alpha beta gamme", "B1"),
      (3L, "zeta eta theta", "B1"), (4L, "totally different", "B2"))
      .toDF("p_partkey", "p_name", "p_brand")
    val out = SimilarityJoin.roSelfJoin(rows, "p_partkey", "p_name", Seq("p_brand"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }
}

class MediaOpsSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark

  test("PNG/BMP fixtures decode to exact known-good dimensions and pixel checksums") {
    // checksum must come from DECODED pixels: both formats are lossless, so
    // it has to equal the fold over the generator's pixel function
    def expectedPixelSum(id: Long, w: Int, h: Int): Long = {
      var sum = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          var z = id * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L + y * 0x94D049BB133111EBL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          sum = sum * 31 + ((z >>> 40).toInt & 0xFFFFFF)
        }
      }
      sum
    }
    Seq(true, false).foreach { png =>
      val d = MediaOps.decodeBytes(7L, MediaOps.encodeImage(7L, 5, 3, png))
      assert(d.kind == "image" && d.format == (if (png) "png" else "bmp"))
      assert(d.width == 5 && d.height == 3 && d.frames == 1)
      assert(d.checksum == expectedPixelSum(7L, 5, 3))
    }
  }

  test("WAV fixture parses fmt/data chunks to exact rate, sample count, sample checksum") {
    val d = MediaOps.decodeBytes(1L, MediaOps.encodeWav(1L, 44100, 1234))
    assert(d.kind == "audio" && d.format == "wav")
    assert(d.sampleRate == 44100 && d.frames == 1234)
    val expected = (0 until 1234).foldLeft(0L) { (sum, i) =>
      sum * 31 + (math.sin(2 * math.Pi * 221 * i / 44100.0) * 12000).toShort
    }
    assert(d.checksum == expected)
  }

  test("WAV chunk walk handles data-before-fmt and odd-length padded chunks") {
    // Rebuild the id=1 fixture with (a) an odd-length LIST chunk before fmt
    // (RIFF pads it to a word boundary) and (b) the data chunk FIRST — both
    // legal layouts; decode must equal the canonical fmt-then-data fixture.
    val canonical = MediaOps.decodeBytes(1L, MediaOps.encodeWav(1L, 44100, 1234))
    val std = MediaOps.encodeWav(1L, 44100, 1234)
    val fmtChunk = std.slice(12, 12 + 8 + 16)
    val dataChunk = std.slice(12 + 8 + 16, std.length)
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val oddList = { // 5-byte LIST payload + 1 pad byte
      val bb = java.nio.ByteBuffer.allocate(8 + 6)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(5).put("INFOx".getBytes("US-ASCII")).put(0.toByte)
      bb.array()
    }
    Seq(
      riff(oddList, fmtChunk, dataChunk),
      riff(dataChunk, fmtChunk),
      riff(dataChunk, oddList, fmtChunk)
    ).foreach { bytes =>
      val d = MediaOps.decodeBytes(1L, bytes)
      assert(d.sampleRate == canonical.sampleRate && d.frames == canonical.frames &&
        d.checksum == canonical.checksum)
    }
  }

  test("WAV walk fails loudly on a corrupt negative chunk length (no hang)") {
    // a negative size field would move the walk backward and re-read the
    // same tag forever — must raise like every other corrupt-input path
    val bytes = MediaOps.encodeWav(1L, 44100, 100)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8) // fmt chunk size field → -8
    val e = intercept[IllegalArgumentException](MediaOps.decodeBytes(1L, bytes))
    assert(e.getMessage.contains("corrupt RIFF chunk length"))
  }

  test("distributed decode recovers every row's declared metadata from the bytes alone") {
    val m = MediaOps.generate(spark, 60).collect()
    val decoded = MediaOps.decode(MediaOps.generate(spark, 60)).collect()
      .map(d => d.mediaId -> d).toMap
    assert(decoded.size == 60)
    m.foreach { row =>
      val d = decoded(row.mediaId)
      assert(d.kind == row.kind)
      row.kind match {
        case "image" =>
          assert(d.width == row.width && d.height == row.height && d.frames == 1)
          assert(d.format == (if (row.mediaId % 2 == 0) "png" else "bmp"))
        case "audio" =>
          assert(d.sampleRate == row.sampleRate && d.frames == row.frames && d.format == "wav")
        case "video" =>
          assert(d.frames == row.frames && d.width == 320 && d.format == "gvid")
      }
    }
    // determinism: same ids -> same decoded checksums across regenerations
    val d2 = MediaOps.decode(MediaOps.generate(spark, 60)).collect()
    assert(decoded.values.map(x => (x.mediaId, x.checksum)).toSet ==
      d2.map(x => (x.mediaId, x.checksum)).toSet)
  }

  test("resize re-encodes real downscaled pixels: re-decoding confirms new dimensions") {
    val m = MediaOps.generate(spark, 30)
    val r = MediaOps.resize(m, maxDim = 32).collect()
    val images = r.filter(_.kind == "image")
    assert(images.exists(x => math.max(x.width, x.height) == 32), "some image should shrink")
    images.foreach { x =>
      assert(math.max(x.width, x.height) <= 32)
      // metadata must agree with what the bytes actually decode to
      val redecoded = MediaOps.decodeBytes(x.mediaId, x.content)
      assert(redecoded.width == x.width && redecoded.height == x.height)
    }
    r.filter(_.kind != "image").foreach(x => assert(x.content.nonEmpty))
  }

  test("sampleFrames explodes every 6th frame for videos only") {
    val out = MediaOps.sampleFrames(MediaOps.generate(spark, 30), stride = 6)
    val byId = out.groupBy("mediaId").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.nonEmpty)
    byId.foreach { case (id, n) =>
      val frames = 24 + (id % 4).toInt * 6
      assert(n == (frames + 5) / 6)
    }
  }
}

/**
 * Quantified ANN recall (the "recall < 1 by construction" disclaimer with a
 * number attached): recall@20 of the LSH multi-probe and IVF probe paths vs
 * the exact brute-force ranking, averaged over 25 seeded queries on the
 * sf0.1 embeddings table (2000 x 64-dim). Floors are asserted here and the
 * measured values recorded in BASELINE.md.
 */
class AnnRecallSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  test("LSH and IVF recall@20 over 25 seeded queries at sf0.1") {
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id", $"embedding").persist()
    e.count()
    val queryIds = (0 until 25).map(i => i * 80L) // seeded, spread over the table
    val queries = e.filter($"vec_id".isin(queryIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(queries.size == 25)
    val ivfIndex = SimOps.buildIvfIndex(e)
    def recallOf(approx: Seq[Float] => Set[Long]): Double = {
      val rs = queryIds.map { qid =>
        val q = queries(qid)
        val brute = SimOps.topKBrute(e, q, k = 20).collect().map(_.getLong(0)).toSet
        (brute intersect approx(q)).size.toDouble / brute.size
      }
      rs.sum / rs.size
    }
    val lshRecall = recallOf(q =>
      SimOps.topKLsh(e, q, k = 20).collect().map(_.getLong(0)).toSet)
    val ivfRecall = recallOf(q =>
      SimOps.topKIvfIndexed(ivfIndex, q, k = 20, nprobe = 8)
        .collect().map(_.getLong(0)).toSet)
    info(f"mean recall@20 over 25 queries: lsh=$lshRecall%.4f ivf(nprobe=8)=$ivfRecall%.4f")
    ivfIndex.unpersist()
    e.unpersist()
    // measured on this fixture (whose 20th neighbors sit at cosine ~0.29,
    // the hard weakly-clustered case): lsh 0.994, ivf 0.81 at nprobe=8 —
    // the IVF coarse quantizer (16 cells) cannot place cosine-0.3 neighbors
    // reliably; its recall/probe sweep (0.48@3 → 0.81@8) is the documented
    // IVF contract. Floors leave headroom for fixture regeneration only.
    assert(lshRecall >= 0.9, f"lsh recall floor: $lshRecall%.4f")
    assert(ivfRecall >= 0.75, f"ivf recall floor: $ivfRecall%.4f")
  }
}
