package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Tight-loop vector kernels invoked from codegen.
  *
  * The declarative dot product — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — allocates an intermediate array per call and walks it through
  * interpreted higher-order-function plumbing; at millions of candidate
  * pairs (ANN rerank, SemDeDup within-cell scoring) that dominates the
  * whole query. This static method is what the generated code calls
  * instead: one fused multiply-add loop, no allocations beyond the two
  * unsafe array reads. Wired in via `StaticInvoke` ([[VecOps.dot]]), so
  * it inlines into whole-stage codegen like a built-in.
  *
  * The summation order (left-to-right, accumulator starts at 0.0) is
  * IDENTICAL to the declarative fold, so every oracle-checked gate that
  * compares scores or score-derived ranks against DuckDB stays
  * bitwise-equal (the cross-engine FLOAT determinism recipe relies on
  * expression SHAPE, which this preserves).
  */
object VecOpsImpl {
  /** Σ a(i)·b(i) over two equal-length double arrays. Fails FAST on
    * ragged lengths or null elements instead of reading out of bounds /
    * treating null as 0.0 — a dimension mismatch (e.g. planes built for
    * the wrong `dim`) is a caller bug that must surface, not produce
    * silent garbage scores. (The declarative `aggregate(zip_with(…))`
    * form returned NULL for both cases — equally a silent wrong
    * answer, just a quieter one.) */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot: vector lengths differ (${n} vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Lenient [[dot]]: returns NULL on ragged lengths or null elements
    * instead of throwing — the old declarative `aggregate(zip_with(…))`
    * contract, for exploratory passes over corpora where malformed
    * embedding rows are expected and should be filterable, not fatal.
    * Well-formed inputs take the identical fused loop, so scores match
    * [[dot]] bitwise. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** x / ‖x‖₂ in one pass: the norm is Σx² summed left-to-right (the
    * same order as [[VecOpsImpl.dot]](x, x)), then each element divided
    * by √norm — bitwise-identical to the declarative
    * `transform(a, _ / l2Norm(a))` formulation, without its two
    * intermediate arrays and per-element lambda plumbing. A ZERO vector
    * is returned unchanged (the [[graft.ops.Similarity.vectorsByIds]]
    * convention): it has no direction, every cosine against it stays
    * 0 — below any threshold — and one garbage row must not kill a
    * 1000-executor job the way the old form's ANSI divide-by-zero
    * did. */
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"normalize: null element at index $i")
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    if (norm == 0.0) {
      i = 0
      while (i < n) { out(i) = a.getDouble(i); i += 1 }
    } else {
      i = 0
      while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VecOps {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
  private val AD = ArrayType(DoubleType)
  private def d(e: Expression): Expression = Cast(e, AD)

  /** Expression builders — shared by the Column API below and the
    * `graft_*` SQL registrations in [[SqlKernels]], so both surfaces
    * plan the identical `StaticInvoke`. Inputs are cast to
    * `array<double>` first (exact for floats), so callers can pass raw
    * float embeddings or already-normalized double vectors
    * interchangeably. */
  private[functions] def dotExpr(a: Expression, b: Expression): Expression =
    StaticInvoke(VecOpsImpl.getClass, DoubleType, "dot",
      Seq(d(a), d(b)), Seq(AD, AD),
      propagateNull = true, returnNullable = false)

  private[functions] def dotOrNullExpr(a: Expression, b: Expression): Expression =
    StaticInvoke(VecOpsImpl.getClass, DoubleType, "dotOrNull",
      Seq(d(a), d(b)), Seq(AD, AD),
      propagateNull = true, returnNullable = true)

  private[functions] def normalizeExpr(a: Expression): Expression =
    StaticInvoke(VecOpsImpl.getClass, AD, "normalize",
      Seq(d(a)), Seq(AD),
      propagateNull = true, returnNullable = false)

  /** Column API: double dot product of two numeric array columns
    * (numeric inputs cast to `array<double>` — exact for floats). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(dotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: lenient dot — NULL (not an exception) on ragged or
    * null-element vectors. See [[VecOpsImpl.dotOrNull]]. */
  def dotOrNull(a: Column, b: Column): Column =
    ColumnBridge.column(dotOrNullExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: L2-normalize a numeric array column (→ `array<double>`). */
  def normalize(a: Column): Column =
    ColumnBridge.column(normalizeExpr(ColumnBridge.expression(a)))
}
