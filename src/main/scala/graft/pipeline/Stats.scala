package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Stage 6: the statistics block (reference: orchestrator.py:483-591) as plain
 * DataFrame aggregations. Every aggregation here gets map-side partial
 * aggregation for free; the top-10s plan as TakeOrderedAndProject (true
 * top-k, no full sort).
 */
object Stats {

  /** types_distribution (orchestrator.py:488-492). */
  def typesDistribution(docEntities: DataFrame): DataFrame =
    docEntities.groupBy(col("entityType")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("entityType"))

  /** linked.{source} count + percent (orchestrator.py:494-506). */
  def linkedShare(docEntities: DataFrame): DataFrame =
    docEntities.agg(
      count(lit(1)).as("total_entities"),
      sum(when(col("qid").isNotNull, 1).otherwise(0)).as("linked_count"),
      round(sum(when(col("qid").isNotNull, 1).otherwise(0)) * 100.0 / count(lit(1)), 2)
        .as("linked_percent"))

  /** Top-k category list with maintenance-keyword filtering
   * (orchestrator.py:508-515 + category_utils.py:160-165). The keyword test
   * is a broadcast-array `exists` — no join needed. */
  def topCategories(linked: Dataset[LinkedEntity], k: Int = 10): DataFrame = {
    val kw = array(KB.maintenanceKeywords.map(lit): _*)
    linked
      .select(explode(col("categories")).as("category"))
      .filter(!exists(kw, w => contains(lower(col("category")), w)))
      .groupBy(col("category")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("category"))
      .limit(k)
  }

  /** The full statistics block as ONE JSON document (reference R6 shape,
   * orchestrator.py:483-591): total_entities, types_distribution, linked
   * share, top categories, entity_connections. Assembled from the
   * already-aggregated small tables — a driver-side collect of
   * dimension-sized results, not a corpus-scale operation. */
  def statisticsJson(linked: Dataset[LinkedEntity], docEntities: DataFrame,
      triples: Dataset[Triple], topK: Int = 10): String = {
    val spark = linked.sparkSession
    val types = typesDistribution(docEntities).collect()
      .map(r => s""""${r.getString(0)}": ${r.getLong(1)}""").mkString("{", ", ", "}")
    val share = linkedShare(docEntities).collect().head
    val cats = topCategories(linked, topK).collect()
      .map(r => s"""{"category": "${r.getString(0)}", "count": ${r.getLong(1)}}""")
      .mkString("[", ", ", "]")
    val conns = entityConnections(triples).limit(topK).collect()
      .map(r => s"""{"entity": "${r.getString(0)}", "connections": ${r.getLong(1)}}""")
      .mkString("[", ", ", "]")
    s"""{"total_entities": ${share.getLong(0)}, "types_distribution": $types, """ +
      s""""linked": {"wikipedia": {"count": ${share.getLong(1)}, "percent": ${share.getDouble(2)}}}, """ +
      s""""top_wikipedia_categories": $cats, "entity_connections": $conns}"""
  }

  /** entity_connections: distinct-neighbor degree over the undirected triple
   * edge list (orchestrator.py:581-590). Exact countDistinct for fixture
   * parity; at 10^12-edge scale swap in approx_count_distinct. */
  def entityConnections(triples: Dataset[Triple]): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select($"subject".as("entity"), $"obj".as("neighbor"))
      .unionByName(triples.select($"obj".as("entity"), $"subject".as("neighbor")))
      .groupBy($"entity")
      .agg(countDistinct($"neighbor").as("connections"))
      .orderBy(desc("connections"), asc("entity"))
  }
}
