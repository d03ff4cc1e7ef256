package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Ratcliff/Obershelp similarity as a native Catalyst expression with full
 * codegen (SURVEY.md §2.10: `levenshtein` is a different metric and would
 * change which predicates merge; difflib-ratio parity needs this exact
 * algorithm). The generated code is a static call into
 * [[graft.pipeline.RatcliffObershelp]] — no boxing, no UDF serialization,
 * stays inside whole-stage codegen spans.
 */
case class RatcliffObershelpSimilarity(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.pipeline.RatcliffObershelp.ratio(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.RatcliffObershelp.ratio($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column-level entry point (Spark 4: Column wraps a ColumnNode; the
   * classic ExpressionUtils bridges to Catalyst Expressions). */
  def ro_sim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RatcliffObershelpSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Register `ro_sim` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ro_sim", exprs => RatcliffObershelpSimilarity(exprs(0), exprs(1)), "built-in")
}

/**
 * SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
 * function at session build time (the extension mechanism the brief's
 * preference ladder points at; no custom Rule/Strategy is needed for this
 * engine — SURVEY.md §7.3 records that decision).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ro_sim"),
      new ExpressionInfo(classOf[RatcliffObershelpSimilarity].getName, "ro_sim"),
      (exprs: Seq[Expression]) => RatcliffObershelpSimilarity(exprs(0), exprs(1))))
  }
}
