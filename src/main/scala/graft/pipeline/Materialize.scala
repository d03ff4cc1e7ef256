package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Stage 7: deterministic materialization with per-partition lineage and
 * stage-granular checkpoint/resume (north_star; the reference's analog is the
 * sha256-keyed JSON file cache, cache_utils.py:7-51, which lets a rerun skip
 * completed work).
 *
 * Physical layout: output partitioned by `lang` (partition pruning for
 * per-language consumers) and bucketed by `pmod(hash(repo), buckets)` — the
 * bucket count is FIXED, independent of shuffle parallelism, so the
 * per-partition sha256 lineage is identical across cluster sizes (the N vs 4N
 * scaling comparison depends on this; SURVEY.md §7.4). The hot-repo skew is
 * defused because one repo hashes to one bucket out of many while every other
 * bucket still receives a balanced share; within a bucket the writer sorts,
 * so files are deterministic byte-for-byte modulo parquet metadata.
 */
object Materialize {

  val DefaultBuckets = 64

  /** Sort columns defining the canonical order of a triple row. */
  val tripleOrder = Seq("subjectId", "predicate", "objectId", "inferred", "docId")

  def withBucket(df: DataFrame, buckets: Int = DefaultBuckets): DataFrame = {
    val base = if (df.columns.contains("repo")) df
      else df.withColumn("repo", substring_index(col("docId"), ":", 1))
    base.withColumn("bucket", pmod(hash(col("repo")), lit(buckets)))
  }

  /**
   * Per-(lang,bucket) lineage rows: row count + sha256 of the sorted row set.
   *
   * STREAMING digest: rows are hash-partitioned on exactly (lang, bucket) —
   * so every row of a group lands in one partition — sorted within the
   * partition by (lang, bucket, r), and folded into a SHA-256 one row at a
   * time inside mapPartitions. Constant memory per task regardless of bucket
   * size (the previous collect_list formulation materialized a whole bucket
   * — ~1.5 TB at 10^12-row scale — as one in-memory array). The digest bytes
   * are identical to sha2(concat_ws("\n", sort_array(collect_list(r)))) —
   * rows joined by '\n' in binary UTF8 order — which LineageDigestSpec pins
   * against the legacy aggregate formulation at fixture scale.
   */
  def lineage(df: DataFrame, stage: String, buckets: Int = DefaultBuckets,
      sortCols: Seq[String] = tripleOrder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // explicit NULL sentinel: bare concat_ws SKIPS null fields, so rows
    // differing only in null position — (a, NULL, b) vs (a, b, NULL) — or
    // null-vs-empty would serialize identically and the digest could not
    // see that corruption. \u0000NUL cannot appear in real column text.
    // Triple rows are all non-null, so digests are unchanged there
    // (LineageDigestSpec still pins the legacy-aggregate equality).
    val rowStr = concat_ws("\u0001",
      sortCols.map(c => coalesce(col(c).cast("string"), lit("\u0000NUL"))): _*)
    val keyed = withBucket(df, buckets)
      .select(col("lang"), col("bucket").cast("int").as("bucket"), rowStr.as("r"))
      .repartition(col("lang"), col("bucket"))
      .sortWithinPartitions(col("lang"), col("bucket"), col("r"))
      .as[(String, Int, String)]
    keyed.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer[(String, Int, Long, String)]()
      var curLang: String = null
      var curBucket: Int = 0
      var md: java.security.MessageDigest = null
      var n = 0L
      var open = false
      def flush(): Unit = if (open) {
        out += ((curLang, curBucket, n, md.digest().map(b => f"${b & 0xff}%02x").mkString))
      }
      it.foreach { case (lang, bucket, r) =>
        if (!open || lang != curLang || bucket != curBucket) {
          flush()
          curLang = lang; curBucket = bucket; open = true
          md = java.security.MessageDigest.getInstance("SHA-256")
          n = 0L
        }
        if (n > 0) md.update('\n'.toByte)
        md.update(r.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        n += 1
      }
      flush()
      out.iterator
    }.toDF("lang", "bucket", "rowCount", "sha256")
      .withColumn("stage", lit(stage))
      .transform(addInputFiles(df, buckets))
  }

  /** north_star lineage contract: "(partition id, input file count, triple
   * count, sha256)" — the input-file count per (lang, bucket) is the number
   * of distinct source documents feeding the partition. A separate exact
   * countDistinct aggregate (map-side partials, constant state per group)
   * joined onto the digest rows — the digest pass itself stays single-pass. */
  private def addInputFiles(df: DataFrame, buckets: Int)(lineage: DataFrame): DataFrame =
    if (!df.columns.contains("docId")) lineage.withColumn("inputFiles", lit(null).cast("long"))
    else {
      val files = withBucket(df, buckets)
        .groupBy(col("lang"), col("bucket").cast("int").as("bucket"))
        .agg(countDistinct(col("docId")).as("inputFiles"))
      lineage.join(files, Seq("lang", "bucket"), "left")
    }

  def completeMarker(dir: String): java.nio.file.Path = Paths.get(dir, "_GRAFT_COMPLETE")

  def isComplete(dir: String): Boolean = Files.exists(completeMarker(dir))

  /**
   * Write a stage output + lineage atomically enough for resume: data and
   * lineage first, the completion marker last. `resume = true` skips the
   * write when the marker exists (stage-granular restart).
   */
  def writeStage(df: DataFrame, stage: String, outDir: String,
      buckets: Int = DefaultBuckets, resume: Boolean = true,
      sortCols: Seq[String] = tripleOrder): Boolean = {
    val dir = s"$outDir/$stage"
    if (resume && isComplete(dir)) return false
    // partition cols lead the sort: FileFormatWriter requires its output
    // ordered by (lang, bucket) and INSERTS ITS OWN SORT on just those keys
    // when the child order doesn't have them as a prefix — discarding the
    // canonical sortCols order (Spark's sort is not stable under spill).
    // With the prefix satisfied, no extra sort runs and file content order
    // IS the canonical order, making the data files deterministic.
    val bucketed = withBucket(df, buckets)
      .repartition(col("lang"), col("bucket"))
      .sortWithinPartitions((Seq("lang", "bucket") ++ sortCols).map(col): _*)
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("lang", "bucket")
      .parquet(s"$dir/data")
    // lineage from the JUST-WRITTEN files, not the logical plan: the digest
    // then describes what is actually on disk, and the stage plan executes
    // ONCE (previously the data write, the digest pass, and the input-file
    // aggregate each re-ran the full upstream plan — 3x stage cost on an
    // unpersisted frame). An EMPTY stage writes no parquet part files
    // (schema inference would fail on the bare directory) — fall back to
    // the original frame there; its lineage is empty either way.
    val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = dataPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val hasFiles = {
      val it = fs.listFiles(dataPath, true)
      var found = false
      while (!found && it.hasNext) found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    val written = if (hasFiles) df.sparkSession.read.parquet(s"$dir/data") else df
    lineage(written, stage, buckets, sortCols)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).json(s"$dir/lineage")
    Files.createDirectories(Paths.get(dir))
    Files.write(completeMarker(dir), java.util.Arrays.asList(stage))
    true
  }

  def readStage(spark: SparkSession, stage: String, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/$stage/data")
}
