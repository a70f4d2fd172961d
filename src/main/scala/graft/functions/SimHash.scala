package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Tight-loop SimHash implementation invoked from codegen.
  *
  * The declarative formulation (64-wide `zip_with` inside `aggregate`)
  * builds a 64-element array per token — ~100 expression evaluations per
  * token. This static method is what a custom Catalyst `Expression`'s
  * generated code calls instead: one xxhash per token, bit-twiddling in
  * registers, no intermediate arrays. Wired into the plan via
  * [[SimHash.simhash64]] using `StaticInvoke`, so it inlines into
  * whole-stage codegen like a built-in.
  */
object SimHashImpl {
  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * xxhash64 values (seed 42, matching Spark's `xxhash64`). */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SimHash {
  /** Column API: 64-bit SimHash of an `array<string>` column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(simhash64Expr(ColumnBridge.expression(tokens)))

  /** Expression builder — shared with [[SqlKernels]]'s `graft_simhash`. */
  private[functions] def simhash64Expr(
      tokens: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      SimHashImpl.getClass, LongType, "simhash",
      Seq(tokens),
      Seq(ArrayType(StringType)),
      propagateNull = true, returnNullable = false)
}
