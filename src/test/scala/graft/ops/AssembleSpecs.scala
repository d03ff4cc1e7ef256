package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofJoinSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2020-01-01 $h%02d:$m%02d:00")

  test("inclusive match, equal-ts tiebreak by largest seq, null when no prior row") {
    val right = Seq(
      (1L, ts(8), 11L, 3.0),
      (1L, ts(10), 10L, 5.0),
      (1L, ts(10), 12L, 7.0) // same ts as seq 10 — larger seq wins
    ).toDF("user_id", "ts", "event_id", "value")
    val left = Seq(
      (100L, 1L, ts(9), 1.0),  // between the 08:00 and 10:00 views
      (101L, 1L, ts(10), 2.0), // equal ts — inclusive, tie row seq 12
      (102L, 2L, ts(10), 3.0)  // user with no right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Timestamp]("matched_ts")), Option(r.getAs[java.lang.Double]("matched_value"))))
      .toMap
    assert(out(100L) == (Some(ts(8)), Some(3.0)))
    assert(out(101L) == (Some(ts(10)), Some(7.0)))
    assert(out(102L) == (None, None))
  }

  test("NULL ts / NULL key rows never match (equi+range-join semantics)") {
    // a NULL-ts right row sorts NULLS-FIRST into the window and would leak
    // a payload into unmatched left rows; a NULL key never equi-matches
    val right = Seq(
      (Some(1L), Some(ts(8)), 10L, 1.0),
      (Some(1L), None, 11L, 99.0),        // null ts: must never match
      (None, Some(ts(7)), 12L, 77.0)      // null key: must never match
    ).toDF("user_id", "ts", "event_id", "value")
    val left = Seq(
      (100L, Some(1L), Some(ts(7))),      // before the 08:00 view: no match
      (101L, Some(1L), Some(ts(9))),      // matches the 08:00 view, not NULL-ts
      (102L, None, Some(ts(9))),          // null key: no match
      (103L, Some(1L), None)              // null ts probe: matches nothing
    ).toDF("event_id", "user_id", "ts")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("matched_value"))).toMap
    assert(out == Map(100L -> None, 101L -> Some(Double.box(1.0)),
      102L -> None, 103L -> None))
  }

  test("equals the brute-force latest-prior scan on random data") {
    val rnd = new scala.util.Random(7)
    val right = (0 until 300).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(24)), 1000L + i, rnd.nextInt(100).toDouble))
    val left = (0 until 200).map(i =>
      (5000L + i, rnd.nextInt(12).toLong, ts(rnd.nextInt(24)), 0.0))
    val out = AsofJoin.asof(
        left.toDF("event_id", "user_id", "ts", "value"),
        right.toDF("user_id", "ts", "event_id", "value"),
        Seq("user_id"), "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("matched_value"))).toMap
    val expect = left.map { case (eid, u, lts, _) =>
      val cands = right.filter(r => r._1 == u && !r._2.after(lts))
      val best =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2.getTime, r._3))._4)
      eid -> best
    }.toMap
    assert(out.size == 200)
    assert(out == expect.map { case (k, v) => k -> v.map(Double.box) })
  }
}

class ContaminationSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  test("flags docs sharing >= minHits n-gram shingles with the benchmark, and only those") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // 2 shared 5-grams with bench 10
      (2L, "alpha beta gamma delta epsilon nine ten"), // 1 shared 5-gram — below minHits
      (3L, "one two three four five six seven")        // disjoint
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta extra")
    ).toDF("doc_id", "text")
    val out = DedupOps.contamination(docs, bench, n = 5, minHits = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
        r.getAs[Long]("hits"))).toSet
    // doc 1 shares shingles [alpha..epsilon],[beta..zeta],[gamma..eta] = 3 hits
    assert(out == Set((1L, 10L, 3L)))
    // lowering minHits surfaces doc 2's single-shingle overlap
    val loose = DedupOps.contamination(docs, bench, n = 5, minHits = 1)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(loose == Set(1L, 2L))
  }

  test("benchmark side of the join is broadcast (no corpus shuffle)") {
    val docs = (0 until 100).map(i => (i.toLong, s"w$i x$i y$i z$i q$i r$i")).toDF("doc_id", "text")
    val plan = DedupOps.contamination(docs, docs.limit(5), n = 3, minHits = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}

class PackOpsSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  test("distributed prefix-sum equals the single-window formulation") {
    val rnd = new scala.util.Random(11)
    // shuffled ids with gaps, skewed token counts
    val rows = rnd.shuffle((0 until 500).map(i =>
      (i.toLong * 3 + (i % 7), ("w " * (1 + rnd.nextInt(200))).trim)))
    val docs = rows.toDF("doc_id", "text").repartition(7)
    val out = PackOps.packShards(docs, "doc_id", TextOps.tokenCount(col("text")),
        budget = 1000, numBins = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("offset"), r.getAs[Long]("shard"))).sortBy(_._1)
    // local reference: exact global running sum in id order
    val ref = rows.map { case (id, t) => (id, t.split("\\s+").length.toLong) }
      .sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1)
      .map { case (id, n, cumIncl) =>
        val off = cumIncl - n
        (id, n, off, off / 1000)
      }
    assert(out.toSeq == ref)
    // sanity: work is actually distributed across bins
    assert(out.map(_._4).distinct.length > 5)
  }

  test("packShards handles tiny and empty inputs") {
    val one = Seq((42L, "a b c")).toDF("doc_id", "text")
    val o1 = PackOps.packShards(one, "doc_id", TextOps.tokenCount(col("text")), 10, numBins = 4)
      .collect()
    assert(o1.length == 1 && o1.head.getAs[Long]("offset") == 0L
      && o1.head.getAs[Long]("shard") == 0L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(PackOps.packShards(empty, "doc_id", TextOps.tokenCount(col("text")), 10).count() == 0L)
  }

  test("packShards rejects a non-integral id column loudly") {
    // a string id would cast to NULL row-by-row and silently collapse the
    // prefix sum — the contract violation must be an error, not bad shards
    val docs = Seq(("doc-1", "a b"), ("doc-2", "c d")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      PackOps.packShards(docs, "doc_id", TextOps.tokenCount(col("text")), 10))
    assert(e.getMessage.contains("integral id column"))
  }

  test("stratifiedSample is a partition-independent pure predicate with working rates") {
    val docs = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val rates = Map("en" -> 5000, "de" -> 0)
    val a = PackOps.stratifiedSample(docs.repartition(1), "lang", "doc_id", rates, 10000)
      .select("doc_id").as[Long].collect().sorted
    val b = PackOps.stratifiedSample(docs.repartition(13), "lang", "doc_id", rates, 10000)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b)) // layout-independent, unlike df.sample
    assert(a.forall(_ % 2 == 0)) // de rate 0 drops every odd id
    val enKept = a.length.toDouble / 1000
    assert(enKept > 0.4 && enKept < 0.6) // ~50% of the 1000 en docs
    // full-rate stratum passes through untouched
    val all = PackOps.stratifiedSample(docs, "lang", "doc_id", Map.empty, 10000).count()
    assert(all == 2000L)
  }
}
