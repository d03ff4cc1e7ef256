package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition probe for round-6 optimization (not a bench). */
object ProbeR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchExtra.session()
    import graft.ops._

    if (args.headOption.contains("pipeline")) {
      // phase-timed pipeline legs (set GRAFT_STAGE_TIMES=1 for the split)
      val nFiles = args.lift(1).map(_.toLong).getOrElse(100000L)
      val kb = args.lift(2).map(_.toLong).getOrElse(0L)
      val reps = args.lift(3).map(_.toInt).getOrElse(2)
      (1 to reps).foreach { i =>
        val (dt, nd, nt) = Bench.runPipelineBench(spark, nFiles, kb)
        println(f"  [pipe] rep$i kb=$kb files=$nd triples=$nt: $dt%.2f s")
      }
      spark.stop(); return
    }

    def time[T](label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"  [probe] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (args.headOption.contains("scaledfine")) {
      // fine-grained scaled-leg decomposition (deltas between lines matter)
      import graft.pipeline._
      val nFiles = args.lift(1).map(_.toLong).getOrElse(100000L)
      val kbSize = args.lift(2).map(_.toLong).getOrElse(100000L)
      val corpus = Corpus.materializeScaled(spark, s"/tmp/graft-corpus-kb$kbSize-$nFiles",
        nFiles, kbSize, numRepos = 200, seed = 42L,
        partitions = spark.sparkContext.defaultParallelism * 2)
      val dims = SyntheticKb.kbDims(spark, kbSize)
      val cfg = PipelineConfig()
      def time1(label: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); f
        println(f"  [fine] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      (1 to 2).foreach { rep =>
        println(s"== scaledfine rep $rep ==")
        time1("corpus scan (sum len)")(corpus.agg(sum(length(col("content")))).head())
        val gaz = dims.gazetteerBroadcast.get
        val ch = Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap)
        time1("chunks count")(ch.count())
        val raw = Detect.rawMentions(ch, gaz)
        time1("rawMentions count")(raw.count())
        import spark.implicits._
        val uniq = raw.drop("chunkId").repartition($"docId").distinct()
        time1("uniq distinct count")(uniq.count())
        val linked = Link.link(raw, dims.labels, broadcastDim = true,
          prebuiltDim = dims.linkDim)
        time1("linked count")(linked.count())
        val linkedP = linked.persist()
        time1("docEntities count (on persisted linked)")(
          Link.docEntities(linkedP).count())
        val de = Link.docEntities(linkedP).persist()
        de.count()
        time1("relate triples noop")(Relate.triples(de, dims.wikidata, true)
          .write.format("noop").mode("overwrite").save())
        time1("fused dedup noop")(Dedup.exactThenConsolidate(
          Relate.triples(de, dims.wikidata, true))
          .write.format("noop").mode("overwrite").save())
        val dedup = Dedup.exactThenConsolidate(
          Relate.triples(de, dims.wikidata, true)).persist()
        dedup.count()
        time1("canonicalTriples noop (canonMap prebuilt)")(
          Canonicalize.canonicalTriples(dedup, dims.canonicalMap.get, true)
            .write.format("noop").mode("overwrite").save())
        dedup.unpersist(); de.unpersist(); linkedP.unpersist()
      }
      spark.stop(); return
    }

    if (args.headOption.contains("cosine")) {
      import graft.functions.VectorFunctions._
      def noop2(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def timeN(label: String)(f: => Unit): Unit = {
        f
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        println(f"  [cos] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val planted = e.unionByName(
        e.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      timeN("normalize projection")(noop2(planted.select(col("vec_id").as("id"),
        SimOps.normalize(col("embedding").cast("array<double>")).as("v"))))
      timeN("band sigs explode")(noop2(planted.select(col("vec_id").as("id"),
        posexplode(lsh_band_sigs(SimOps.normalize(col("embedding").cast("array<double>")), 32, 8)))))
      timeN("cosineDupPairs full")(noop2(SimOps.cosineDupPairs(planted, 0.95)))
      graft.ops.SimOps.unpersistIntermediates()
      timeN("cosineDupClusters full")(noop2(SimOps.cosineDupClusters(planted, 0.95)))
      spark.stop(); return
    }

    if (args.headOption.contains("relate")) {
      import graft.pipeline._
      import spark.implicits._
      val nFiles = 100000L; val kbSize = 100000L
      val corpus = Corpus.materializeScaled(spark, s"/tmp/graft-corpus-kb$kbSize-$nFiles",
        nFiles, kbSize, numRepos = 200, seed = 42L,
        partitions = spark.sparkContext.defaultParallelism * 2)
      val dims = SyntheticKb.kbDims(spark, kbSize)
      val cfg = PipelineConfig()
      val gaz = dims.gazetteerBroadcast.get
      val mentions = Detect.rawMentions(Detect.chunks(corpus, cfg.chunkSize, cfg.chunkOverlap), gaz)
      val linked = Link.link(mentions, dims.labels, broadcastDim = true,
        prebuiltDim = dims.linkDim).persist()
      val de = Link.docEntities(linked).persist()
      de.count()
      def noop2(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def timeN(label: String)(f: => Unit): Unit = {
        f
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        println(f"  [rel] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      val kbRel = Relate.kbRelations(dims.wikidata, "qid").withColumnRenamed("kKey", "qid")
      def implicitJoin(hint: Boolean): org.apache.spark.sql.DataFrame = {
        val lifted = de.as("e").join(broadcast(kbRel).as("k"), $"e.qid" === $"k.qid", "inner")
        val tgt0 = de.select($"docId".as("tDocId"), $"entityName".as("tName"),
          $"entityType".as("tType"), $"inferred".as("tInferred"))
        val tgt = if (hint) tgt0.hint("SHUFFLE_HASH") else tgt0
        lifted.join(tgt, $"e.docId" === $"tDocId" && $"target" === $"tName", "inner")
          .select($"e.entityName", $"predicate", $"tName", $"e.docId")
      }
      timeN("implicit join SMJ (no hint)")(noop2(implicitJoin(false)))
      timeN("implicit join SHUFFLE_HASH")(noop2(implicitJoin(true)))
      timeN("explicitTriples")(noop2(Relate.explicitTriples(de)))
      timeN("full relate noop")(noop2(Relate.triples(de, dims.wikidata, true).toDF()))
      timeN("fused dedup on relate")(noop2(Dedup.exactThenConsolidate(
        Relate.triples(de, dims.wikidata, true)).toDF()))
      spark.stop(); return
    }

    if (args.headOption.contains("degree")) {
      import org.apache.spark.sql.DataFrame
      def noop2(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
      def timeN(label: String)(f: => Unit): Unit = {
        f
        val ts = (1 to 4).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        println(f"  [deg] $label: ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def v0(agg: String): DataFrame = {
        val li = liRaw
        val e = li.select(concat(lit("p"), col("l_partkey")).as("node"),
            concat(lit("s"), col("l_suppkey")).as("nbr"))
          .unionByName(li.select(concat(lit("s"), col("l_suppkey")).as("node"),
            concat(lit("p"), col("l_partkey")).as("nbr")))
        val g = if (agg == "exact") e.groupBy(col("node")).agg(countDistinct(col("nbr")).as("d"))
          else e.groupBy(col("node")).agg(approx_count_distinct(col("nbr")).as("d"))
        g.orderBy(desc("d"), col("node")).limit(50)
      }
      def v2(agg: String): DataFrame = {
        val li = graft.ops.Par.fanOut(liRaw.select(col("l_partkey"), col("l_suppkey")))
        val e = li.select(explode(array(
            struct(lit(0).as("tag"), col("l_partkey").as("key"), col("l_suppkey").as("nkey")),
            struct(lit(1).as("tag"), col("l_suppkey").as("key"), col("l_partkey").as("nkey")))).as("e"))
          .select(col("e.tag").as("tag"), col("e.key").as("key"), col("e.nkey").as("nkey"))
        val g = if (agg == "exact") e.groupBy(col("tag"), col("key")).agg(countDistinct(col("nkey")).as("d"))
          else e.groupBy(col("tag"), col("key")).agg(approx_count_distinct(col("nkey")).as("d"))
        g.select(concat(when(col("tag") === 0, "p").otherwise("s"), col("key")).as("node"), col("d"))
          .orderBy(desc("d"), col("node")).limit(50)
      }
      def v3(agg: String): DataFrame = { // numeric keys, NO fanOut
        val li = liRaw.select(col("l_partkey"), col("l_suppkey"))
        val e = li.select(explode(array(
            struct(lit(0).as("tag"), col("l_partkey").as("key"), col("l_suppkey").as("nkey")),
            struct(lit(1).as("tag"), col("l_suppkey").as("key"), col("l_partkey").as("nkey")))).as("e"))
          .select(col("e.tag").as("tag"), col("e.key").as("key"), col("e.nkey").as("nkey"))
        val g = if (agg == "exact") e.groupBy(col("tag"), col("key")).agg(countDistinct(col("nkey")).as("d"))
          else e.groupBy(col("tag"), col("key")).agg(approx_count_distinct(col("nkey")).as("d"))
        g.select(concat(when(col("tag") === 0, "p").otherwise("s"), col("key")).as("node"), col("d"))
          .orderBy(desc("d"), col("node")).limit(50)
      }
      for (agg <- Seq("exact", "approx")) {
        timeN(s"v0 union-strings $agg")(noop2(v0(agg)))
        timeN(s"v2 fanout-numeric $agg")(noop2(v2(agg)))
        timeN(s"v3 plain-numeric $agg")(noop2(v3(agg)))
      }
      spark.stop(); return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs scan")(noop(docs))
    time("docs explode 5-grams (no distinct)")(noop(
      docs.select(col("doc_id").as("id"),
        explode(when(size(TextOps.tokens(col("text"))) >= 5,
          transform(sequence(lit(0), size(TextOps.tokens(col("text"))) - 5),
            i => concat_ws("", slice(TextOps.tokens(col("text")), i + 1, lit(5)))))
          .otherwise(array().cast("array<string>"))).as("shingle"))))
    time("shingles(docs,5) incl distinct")(noop(DedupOps.shingles(docs, 5)))
    val docsR = docs.repartition(32)
    time("shingles over pre-repartitioned docs")(noop(DedupOps.shingles(docsR, 5)))
    time("contamination full")(noop(DedupOps.contamination(docs,
      docs.filter(col("doc_id") % 50 === 0), n = 5, minHits = 2)))
    time("contamination pre-repartitioned")(noop(DedupOps.contamination(docsR,
      docsR.filter(col("doc_id") % 50 === 0), n = 5, minHits = 2)))
    spark.stop()
  }
}
