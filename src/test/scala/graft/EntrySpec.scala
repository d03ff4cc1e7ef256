package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry and the queries/oracle maps. */
class EntrySpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark

  test("entry returns a non-empty canonical triple table") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("subjectId") && df.columns.contains("predicate"))
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every query runs on sf0.001 and returns rows with stable columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val n = df.limit(5).collect().length
      assert(df.columns.nonEmpty, name)
      // empty results are legitimate only for filters that can select nothing
      // q_cosine_pairs plants duplicates, so it must always return rows
      if (!Set("q_anti_join", "q_jaccard_pairs", "q_minhash_dedup",
          "q_neardup_clusters", "q_simhash_pairs", "q_similarity_expr").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
