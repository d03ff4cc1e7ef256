package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen vector kernels for the similarity operators (SURVEY.md §2.10;
 * reference behavior: embedding-cosine near-dup + ANN, beyond-reference
 * training-data ops).
 *
 * Why not `functions.aggregate`/`zip_with`: Spark's higher-order functions are
 * `CodegenFallback` — every element evaluation is an interpreted lambda call
 * with boxing. A 64-dim dot product through `aggregate(zip_with(...))` costs
 * hundreds of megamorphic calls; over millions of candidate pairs that was
 * the single largest line in the round-2 bench (q_cosine_pairs 91 s). These
 * expressions compile to a static call around a tight primitive loop and stay
 * inside whole-stage codegen spans.
 */
object VectorOps {

  /** Σ aᵢ·bᵢ over the common prefix; arrays must hold non-null doubles. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** v / ‖v‖₂ — computed ONCE per row so pairwise verification is a single
   * dot (the round-2 form re-derived both norms per candidate pair). A zero
   * vector normalizes to NaNs; NaN similarities never pass a `>=` filter. */
  def l2normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) * inv; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Deterministic pseudo-random hyperplane component (p, j) in [-1, 1] via a
   * splitmix64-style mix — a pure function of the indices, so every executor
   * and every task retry sees the same planes with no RNG state and no
   * shipped table. (Bit-identical to the round-2 literal-array formulation.)
   */
  def mix(p: Int, j: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Plane matrix [p][j] = mix(p, j), materialized ONCE per (nPlanes, dim)
   * per JVM — mix() is ~15 ALU ops, and recomputing it per row multiplied
   * the signature cost ~15× (a 64-dim, 256-plane signature touches 16k
   * components per row). Pure function of the indices ⇒ identical on every
   * executor; the tiny map only ever holds a few shapes. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      Array.tabulate(np, d)((p, j) => mix(p, j))
    })

  /** nPlanes sign bits packed little-endian: bit p = [dot(v, plane_p) >= 0].
   * nPlanes > 64 would silently wrap (`1L << p` uses p mod 64) and collide
   * signatures — guard loudly. */
  def lshSignature(v: ArrayData, nPlanes: Int): Long = {
    require(nPlanes <= 64, s"lshSignature packs into one long: nPlanes=$nPlanes > 64")
    val dim = v.numElements()
    val pl = planes(nPlanes, dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val row = pl(p)
      var s = 0.0
      var j = 0
      while (j < dim) { s += v.getDouble(j) * row(j); j += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Banded signatures: element b packs the rowsPerBand sign bits of planes
   * [b·rowsPerBand, (b+1)·rowsPerBand). Sign of a dot is scale-invariant, so
   * signatures of a normalized vector equal those of the raw vector. */
  def bandSigs(v: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    require(rowsPerBand <= 64,
      s"bandSigs packs a band into one long: rowsPerBand=$rowsPerBand > 64")
    val dim = v.numElements()
    val pl = planes(bands * rowsPerBand, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val row = pl(b * rowsPerBand + r)
        var s = 0.0
        var j = 0
        while (j < dim) { s += v.getDouble(j) * row(j); j += 1 }
        if (s >= 0) sig |= (1L << r)
        r += 1
      }
      out(b) = sig
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dot($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class ArrayL2Normalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullSafeEval(a: Any): Any =
    VectorOps.l2normalize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorOps.l2normalize($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HyperplaneLshSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullSafeEval(a: Any): Any =
    VectorOps.lshSignature(a.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorOps.lshSignature($a, $nPlanes);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HyperplaneBandSigs(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullSafeEval(a: Any): Any =
    VectorOps.bandSigs(a.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorOps.bandSigs($a, $bands, $rowsPerBand);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points (Spark 4: via the classic-Expression bridge). */
object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column =
    column(ArrayDotProduct(expression(a), expression(b)))

  def vec_l2normalize(a: Column): Column =
    column(ArrayL2Normalize(expression(a)))

  def lsh_signature(v: Column, nPlanes: Int): Column =
    column(HyperplaneLshSignature(expression(v), nPlanes))

  def lsh_band_sigs(v: Column, bands: Int, rowsPerBand: Int): Column =
    column(HyperplaneBandSigs(expression(v), bands, rowsPerBand))
}
