package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header decoding as a codegen kernel: PNG IHDR and JPEG
  * SOF parsing is pure byte-offset arithmetic — no media library
  * needed — so the one honest gap in the multimodal tier (metadata
  * extraction) is closed with the same `StaticInvoke` pattern as
  * [[VecOpsImpl]]: a tight loop over the payload's first bytes that
  * inlines into whole-stage codegen and never leaves the executor.
  *
  * Formats:
  *   - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
  *     (PNG spec §5.6) — width/height are the two big-endian u32s at
  *     fixed offsets 16/20.
  *   - JPEG: SOI marker, then a marker-segment walk (segments are
  *     [0xFF, marker, u16 length]) to the first SOF0–SOF15 frame
  *     header (skipping DHT/DAC/JPG-extension markers, standalone
  *     markers and fill bytes), which carries height/width as
  *     big-endian u16s. The walk touches only segment headers — O(#
  *     segments), independent of payload size.
  *
  * Anything else parses as `unknown` / -1 — a corrupt header on one
  * row of a 100 TB corpus must produce a filterable value, not kill
  * the job (same lenient contract as [[VecOpsImpl.dotOrNull]]).
  */
object MediaHeadersImpl {

  /** (format, width, height) with -1 dims when not parseable — the
    * single-parse entry point for JVM callers ([[graft.ops.Multimodal
    * .decodeMeta]]); the per-column statics below each re-parse, which
    * is fine for the tiny header but wasteful in a row-at-a-time loop. */
  def headerMeta(b: Array[Byte]): (String, Int, Int) = parse(b)

  private def parse(b: Array[Byte]): (String, Int, Int) = {
    if (isPng(b)) {
      // IHDR must be the first chunk: [u32 len][IHDR][u32 w][u32 h]...
      if (b.length >= 24 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = u32(b, 16)
        val h = u32(b, 20)
        // PNG caps dimensions at 2^31-1; a high bit means corruption
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          ("png", w.toInt, h.toInt)
        else ("png", -1, -1)
      } else ("png", -1, -1)
    } else if (isJpeg(b)) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return ("jpeg", -1, -1) // lost sync
        val marker = b(i + 1) & 0xFF
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // standalone
        else if (marker == 0xD9 || marker == 0xDA) return ("jpeg", -1, -1) // EOI/SOS: no SOF seen
        else {
          if (i + 3 >= b.length) return ("jpeg", -1, -1)
          val segLen = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
          if (segLen < 2) return ("jpeg", -1, -1)
          if (isSof(marker)) {
            // [len u16][precision u8][height u16][width u16]...
            if (i + 8 >= b.length || segLen < 8) return ("jpeg", -1, -1)
            val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
            val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
            return ("jpeg", w, h)
          }
          i += 2 + segLen
        }
      }
      ("jpeg", -1, -1)
    } else ("unknown", -1, -1)
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 &&
      (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF

  /** SOF0–SOF15 carry frame dimensions — EXCEPT C4 (DHT), C8 (JPG
    * extension) and CC (DAC), which reuse the Cx range for tables. */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  // --- static entry points the generated code calls (and decodeMeta's
  // --- JVM batch loop reuses directly) ------------------------------

  def formatName(b: Array[Byte]): String = parse(b)._1
  def widthOf(b: Array[Byte]): Int = parse(b)._2
  def heightOf(b: Array[Byte]): Int = parse(b)._3

  def format(b: Array[Byte]): UTF8String = UTF8String.fromString(formatName(b))
}

/** Column / Expression surface for [[MediaHeadersImpl]]. */
object MediaHeaders {

  private[functions] def formatExpr(b: Expression): Expression =
    StaticInvoke(MediaHeadersImpl.getClass, StringType, "format",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  private[functions] def widthExpr(b: Expression): Expression =
    StaticInvoke(MediaHeadersImpl.getClass, IntegerType, "widthOf",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  private[functions] def heightExpr(b: Expression): Expression =
    StaticInvoke(MediaHeadersImpl.getClass, IntegerType, "heightOf",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  /** Container format of a binary payload: `png` | `jpeg` | `unknown`. */
  def mediaFormat(payload: Column): Column =
    ColumnBridge.column(formatExpr(ColumnBridge.expression(payload)))

  /** Pixel width from the PNG IHDR / JPEG SOF header; -1 if absent. */
  def mediaWidth(payload: Column): Column =
    ColumnBridge.column(widthExpr(ColumnBridge.expression(payload)))

  /** Pixel height from the PNG IHDR / JPEG SOF header; -1 if absent. */
  def mediaHeight(payload: Column): Column =
    ColumnBridge.column(heightExpr(ColumnBridge.expression(payload)))
}
