// temp probe — prints the physical agg operators used by link/docEntities
package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline._
    val corpus = Corpus.generate(spark, 100, 10, 42L, 2)
    val gaz = spark.sparkContext.broadcast(Gazetteer.fromKb())
    val mentions = Detect.rawMentions(Detect.chunks(corpus), gaz)
    val linked = Link.link(mentions, KB.labels(spark))
    println("---- link plan ----")
    println(linked.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Aggregate") || l.contains("Sort")).mkString("\n"))
    val de = Link.docEntities(linked)
    println("---- docEntities plan ----")
    println(de.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Aggregate") || l.contains("Sort")).mkString("\n"))
    spark.stop()
  }
}
