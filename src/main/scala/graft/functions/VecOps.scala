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

  /** Johnson–Lindenstrauss sign projection kernel — the tight-loop
    * form of [[graft.ops.Similarity.randomProject]]'s arithmetic (a
    * 1024-term unrolled Column expression measured ~11 µs/row at
    * 64×16; this loop is the dot-kernel move that fixed the
    * similarity family). EXACT contract, pinned by KernelParitySpec
    * against the declarative form:
    *   - scaled s_d = round(a_d · scale) with ties away from zero
    *     (Spark `round` / DuckDB `round` semantics — `Math.round`'s
    *     half-UP would diverge on negative .5 boundaries),
    *   - sign(j,d) = lcg(d) · had(j,d): a RANDOM-DIAGONAL Hadamard
    *     (SRHT — the Ailon–Chazelle FJLT family): lcg(d) = +1 iff
    *     (1103515245·d + 12345) % 2001 ≥ 1000 (the gridPlanes LCG),
    *     had(j,d) = +1 iff popcount(j & d) is even (Walsh–Hadamard
    *     row parity). Hadamard rows are mutually ORTHOGONAL whenever
    *     `dim` is a multiple of the smallest power of two above
    *     outDim (64×16 qualifies) — on isotropic data the projected
    *     coordinates come out DECORRELATED, which is what makes the
    *     sign-bucket partitions of the JL index near-uniform. The
    *     first cut used a flat LCG sign per (j,d): its rows carried
    *     ~1/√dim pairwise correlation and MEASURED bucket skew was
    *     160× uniform (hottest bucket ~4% of a random corpus; SRHT:
    *     balanced at the designed n/2^bits),
    *   - out_j = Σ_d sign(j,d) · s_d, exact longs.
    * Vectors shorter than `dim` raise typed (never zero-pad — a
    * silent pad would mask corrupt embeddings); extra trailing
    * dimensions are ignored, matching element_at(1..dim). */
  def jlProject(a: ArrayData, dim: Int, outDim: Int, scale: Double): ArrayData = {
    if (a.numElements() < dim)
      throw new IllegalArgumentException(
        s"jlProject: vector has ${a.numElements()} elements, needs $dim")
    val s = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      if (a.isNullAt(d))
        throw new IllegalArgumentException(s"jlProject: null element at index $d")
      val v = a.getDouble(d) * scale
      // round half away from zero = Spark round() = DuckDB round().
      // Math.round is nearest-with-ties-up and boundary-correct (a
      // hand-rolled floor(v+0.5) mis-rounds doubles just under a half
      // integer); mirroring through -Math.round(-v) turns ties-up
      // into ties-away-from-zero on the negative side
      val r = if (v >= 0) Math.round(v) else -Math.round(-v)
      // fold the random diagonal in once per input coordinate
      s(d) = if ((1103515245L * d + 12345L) % 2001L >= 1000L) r else -r
      d += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var sum = 0L
      var i = 0
      while (i < dim) {
        sum += (if ((Integer.bitCount(j & i) & 1) == 0) s(i) else -s(i))
        i += 1
      }
      out(j) = sum
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ (a_i − b_i)² over two equal-length LONG arrays — the projected-
    * space candidate metric of [[graft.ops.Similarity.jlTopKIndexed]].
    * Exact integer arithmetic (order-independent, so the declarative
    * `aggregate(zip_with(…))` form is bit-equal in range — pinned in
    * KernelParitySpec); the kernel exists because candidate scoring is
    * the per-pair hot loop of the serving path (the dot-kernel class).
    * Fails fast on ragged/null inputs, like [[dot]], and RAISES on
    * ±2⁶³ overflow via exact arithmetic — the declarative form raised
    * ARITHMETIC_OVERFLOW under Spark 4 ANSI, and a silent wrap (e.g. a
    * caller-chosen scale of 1e9 on unit-range 64-dim inputs puts one
    * squared difference past 2⁶³) would garbage every candidate rank
    * with no error (the round-8 trace-the-whole-value-path class). */
  def l2sqLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"l2sqLong: vector lengths differ (${n} vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"l2sqLong: null element at index $i")
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    s
  }
}

object VecOps {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
  private val AD = ArrayType(DoubleType)
  private val AL = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
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

  private[functions] def jlProjectExpr(a: Expression, dim: Int, outDim: Int,
      scale: Double): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DoubleType => DT, IntegerType => IT}
    StaticInvoke(VecOpsImpl.getClass, AL, "jlProject",
      Seq(d(a), Literal(dim), Literal(outDim), Literal(scale)),
      Seq(AD, IT, IT, DT),
      propagateNull = true, returnNullable = false)
  }

  private[functions] def l2sqLongExpr(a: Expression, b: Expression): Expression = {
    // cast target keeps nullable elements (parquet-read arrays are
    // element-nullable even when written dense); the kernel's own
    // isNullAt check raises typed on an actual null
    val ALn = ArrayType(org.apache.spark.sql.types.LongType)
    StaticInvoke(VecOpsImpl.getClass, org.apache.spark.sql.types.LongType,
      "l2sqLong", Seq(Cast(a, ALn), Cast(b, ALn)), Seq(ALn, ALn),
      propagateNull = true, returnNullable = false)
  }

  /** Column API: exact integer squared L2 distance of two
    * `array<bigint>` columns — see [[VecOpsImpl.l2sqLong]]. */
  def l2sqLong(a: Column, b: Column): Column =
    ColumnBridge.column(l2sqLongExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

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

  /** Column API: JL sign projection to `outDim` exact BIGINTs — see
    * [[VecOpsImpl.jlProject]] and
    * [[graft.ops.Similarity.randomProject]]. */
  def jlProject(a: Column, dim: Int, outDim: Int, scale: Double): Column =
    ColumnBridge.column(jlProjectExpr(ColumnBridge.expression(a),
      dim, outDim, scale))
}
