package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop exact Jaccard over two string-array columns, invoked from
  * codegen via `StaticInvoke`.
  *
  * The declarative form — `size(array_intersect(a, b)) /
  * greatest(size(array_union(a, b)), 1)` — materializes two whole
  * intermediate arrays per pair just to take their sizes. Candidate
  * verification (LSH near-dedup, index probes) calls this once per
  * candidate pair, so the kernel computes both cardinalities directly
  * from two hash sets: same distinct-element semantics (duplicates
  * collapse, a null element counts as one distinct value, equality is
  * byte-wise UTF8 — exactly `array_intersect`/`array_union`'s), and the
  * result is the same exact ratio of two ints, so every oracle gate
  * stays bitwise-identical. */
object JaccardImpl {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      sa.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var inter = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val s = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (sb.add(s) && sa.contains(s)) inter += 1
      i += 1
    }
    val union = sa.size() + sb.size() - inter
    inter.toDouble / math.max(union, 1).toDouble
  }
}

object Jaccard {
  /** Column API: exact Jaccard similarity of two `array<string>`
    * columns. NOTE the string contract: non-string element types are
    * implicitly CAST to string first, so numeric arrays compare by
    * their string forms (`-0.0` ≠ `0.0` here, where the old
    * `array_intersect` form used SQL numeric equality) — shingle/token
    * arrays, the intended inputs, are unaffected. */
  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(jaccardExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Expression builder — shared with [[SqlKernels]]'s `graft_jaccard`. */
  private[functions] def jaccardExpr(
      a: org.apache.spark.sql.catalyst.expressions.Expression,
      b: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      JaccardImpl.getClass, DoubleType, "jaccard",
      Seq(a, b),
      Seq(ArrayType(StringType), ArrayType(StringType)),
      propagateNull = true, returnNullable = false)
}
