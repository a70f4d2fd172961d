package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XXH64}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Tight-loop MinHash signature, invoked from codegen (same pattern as
  * [[SimHashImpl]]).
  *
  * The declarative form (`array(k × array_min(transform(hashes, …)))`)
  * allocates k intermediate arrays per row; this computes each shingle's
  * base hash once and folds all k re-seeded mixes in registers —
  * O(k·|shingles|) integer ops, one output allocation.
  */
object MinHashImpl {
  /** The shared k-slot min computation: each non-null shingle hashed
    * once (seed 42), each slot keeps the min of the j-re-seeded mix.
    * BOTH public kernels go through this, so the fused band path can
    * never diverge from the signature path. */
  private def mins(shingles: ArrayData, k: Int): Array[Long] = {
    val m = new Array[Long](k)
    java.util.Arrays.fill(m, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
          if (h < m(j)) m(j) = h
          j += 1
        }
      }
      i += 1
    }
    m
  }

  def signature(shingles: ArrayData, k: Int): ArrayData =
    new GenericArrayData(mins(shingles, k))

  /** LSH band keys in ONE pass: the k-slot signature folded into
    * `numBands` hashes, each bit-identical to Spark's
    * `xxhash64(slice(sig, b·r+1, r))` — seed 42, then
    * `XXH64.hashLong(element, acc)` per slot in order, the
    * `HashExpression` array fold — while skipping the signature
    * projection and the per-band slice allocations. */
  def bandHashes(shingles: ArrayData, numHashes: Int, numBands: Int): ArrayData = {
    val sig = mins(shingles, numHashes)
    val rowsPerBand = numHashes / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 42L
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { h = XXH64.hashLong(sig(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

object MinHash {
  /** Column API: k-slot MinHash signature (`array<bigint>`) of an
    * `array<string>` shingle column. */
  def signature(shingles: Column, k: Int): Column =
    ColumnBridge.column(signatureExpr(ColumnBridge.expression(shingles), k))

  /** Expression builder — shared with [[SqlKernels]]'s `graft_minhash_sig`. */
  private[functions] def signatureExpr(
      shingles: org.apache.spark.sql.catalyst.expressions.Expression, k: Int)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      MinHashImpl.getClass, ArrayType(LongType, containsNull = false), "signature",
      Seq(shingles, Literal(k)),
      Seq(ArrayType(StringType), IntegerType),
      propagateNull = true, returnNullable = false)

  /** Column API: `numBands` LSH band keys (`array<bigint>`) of an
    * `array<string>` shingle column — fused signature + banding.
    * Parameters are validated HERE, at plan-build time on the driver,
    * not per-row on executors mid-job. */
  def bandHashes(shingles: Column, numHashes: Int, numBands: Int): Column = {
    require(numBands > 0 && numHashes > 0,
      s"bandHashes: numHashes=$numHashes, numBands=$numBands must be positive")
    require(numHashes % numBands == 0,
      s"bandHashes: numBands=$numBands must divide numHashes=$numHashes " +
        "(trailing signature slots would be silently ignored)")
    ColumnBridge.column(StaticInvoke(
      MinHashImpl.getClass, ArrayType(LongType, containsNull = false), "bandHashes",
      Seq(ColumnBridge.expression(shingles), Literal(numHashes), Literal(numBands)),
      Seq(ArrayType(StringType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = false))
  }
}
