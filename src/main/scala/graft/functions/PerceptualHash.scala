package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Perceptual (difference-hash) fingerprinting for media payloads —
  * the operator that turns the multimodal tier from exact-byte dedup
  * ([[graft.ops.Dedup.exactGroupsByHash]] over digests) into NEAR-dup:
  * a re-encoded / slightly-corrupted copy of an image hashes within a
  * few bits of its original instead of sailing through untouched. The
  * reference has nothing here (it stringifies blobs —
  * `filesql.go:649-707`); this is extension-tier, built on the
  * published dHash construction (box-downsample to a tiny grid,
  * hash = adjacent-cell brightness comparisons).
  *
  * Byte signal contract: [[dhash63]] hashes whatever byte signal
  * arrives — the hash arithmetic is exactly the published dHash.
  * [[PngDecodeImpl]] supplies the REAL pixel signal for PNG payloads
  * and [[JpegDecodeImpl]] for baseline JPEGs (both zero-dep decodes to
  * the luma plane, fed through this unchanged kernel via
  * [[PngDecode.dhashDecoded]] — what the phash ops use by default);
  * every other payload keeps the documented bytes-as-luma behavior
  * (same lenient contract as [[graft.ops.Multimodal.stubDecode]]).
  *
  * Construction (all exact integer arithmetic, replayable by an
  * independent engine — every step is `%`/`//`-portable because all
  * operands are non-negative):
  *   - box-downsample the n-byte signal into 64 cells: cell j averages
  *     bytes [j·n/64, max(j·n/64 + 1, (j+1)·n/64)) (floor division;
  *     the max() keeps windows non-empty for payloads under 64 bytes),
  *   - 63 difference bits: bit j = 1 iff cell j > cell j+1,
  *   - hash = Σ bit_j · 2^j  — bits 0..62 only, deliberately 63-bit:
  *     DuckDB's BIGINT `<<` is overflow-CHECKED (`1::BIGINT << 63`
  *     raises — CLAUDE.md round-6), so a 64th bit would make the
  *     oracle inexpressible; one comparison is a price worth the
  *     cross-engine contract.
  *
  * Near-dup pairs then come from the SAME pigeonhole band machinery
  * as SimHash ([[graft.ops.Dedup.simhashPairs]] — maxDistance+1
  * chunks, any ≤maxDistance pair shares an exact chunk): the hash is
  * just a 64-bit signature column, nothing SimHash-specific in the
  * banding.
  *
  * Like every kernel here, invoked via `StaticInvoke` so it inlines
  * into whole-stage codegen ([[VecOpsImpl]] pattern); null payloads
  * propagate null (filterable, never fatal).
  */
object PerceptualHashImpl {

  /** 63-bit dHash of a byte signal; 0 for an empty payload (a real
    * decoder failure upstream yields null, which propagates instead).
    * Windows are addressed with Long arithmetic — j·n overflows Int
    * for payloads over 2^25 bytes. */
  def dhash63(b: Array[Byte]): Long = {
    val n = b.length
    if (n == 0) return 0L
    val cells = new Array[Long](64)
    var j = 0
    while (j < 64) {
      val lo = (j.toLong * n / 64).toInt
      var hi = ((j + 1).toLong * n / 64).toInt
      if (hi <= lo) hi = lo + 1
      var s = 0L
      var i = lo
      while (i < hi) { s += (b(i) & 0xFF); i += 1 }
      cells(j) = s / (hi - lo)
      j += 1
    }
    var h = 0L
    j = 0
    while (j < 63) {
      if (cells(j) > cells(j + 1)) h |= (1L << j)
      j += 1
    }
    h
  }
}

/** Column surface for [[PerceptualHashImpl]]. */
object PerceptualHash {

  private[functions] def dhashExpr(b: Expression): Expression =
    StaticInvoke(PerceptualHashImpl.getClass, LongType, "dhash63",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  /** 63-bit perceptual difference-hash of a binary payload. */
  def dhash(payload: Column): Column =
    ColumnBridge.column(dhashExpr(ColumnBridge.expression(payload)))
}
