package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full KG pipeline (detect → link → relate → dedup →
    * canonicalize) over a seed-fixed synthetic corpus; returns the canonical
    * triple table. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.pipeline._
    val corpus = Corpus.generate(spark, numFiles = 500L, numRepos = 50, seed = 42L, partitions = 8)
    Pipeline.run(spark, corpus).canonicalTriples.toDF()
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
