package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, LongType}

/** Zero-dependency AVI (RIFF) container walk — the video leg of the
  * multimodal tier, completing the image ([[PngDecodeImpl]] /
  * [[JpegDecodeImpl]]) and audio ([[WavDecodeImpl]]) siblings: a
  * video payload stops being a byte blob sliced at a fixed stride and
  * yields its REAL frames, each fed through the decoded perceptual
  * hash (MJPEG-style AVIs carry baseline JPEG frames → real pixels;
  * other codecs keep the bytes-as-luma stand-in on the frame bytes).
  * The reference has nothing here (blobs are stringified —
  * `filesql.go:649-707`); the parse is pure public-spec byte work
  * (RIFF chunk grammar, AVI `LIST/movi` layout per the OpenDML/AVI
  * specification), reusing the chunk-walk discipline of
  * [[WavDecodeImpl]].
  *
  * Scope (anything else falls back to the byte-stride frame model —
  * filterable/gradeable, never fatal):
  *   - `RIFF`…`AVI ` container; frames are the stream-0 video chunks
  *     (`00dc` compressed / `00db` uncompressed) inside the `LIST
  *     movi` body, in file order — the canonical frame order without
  *     needing `idx1`,
  *   - one level of `LIST rec ` grouping inside `movi` (the
  *     interleave-group form the spec allows) is walked; deeper
  *     nesting is out of scope → byte fallback,
  *   - declared chunk sizes are checked against the REAL buffer
  *     before any use (the hostile-header rule shared by all three
  *     decoders); a lying size → byte fallback,
  *   - at most [[MaxFrames]] video chunks are walked (the composite
  *     (video, frame) key budget in
  *     [[graft.ops.Multimodal.videoNearDupPairs]] is 4096 frames;
  *     collecting past it could only feed frames that budget raises
  *     on) — a longer video is truncated at the cap, documented, not
  *     an error,
  *   - zero-byte video chunks (dropped/delta frame placeholders) ARE
  *     frames: they advance the frame index and hash to
  *     `dhash63(empty) = 0`, keeping position alignment honest.
  *
  * [[videoHashes63]] is the ONE kernel behind
  * [[graft.ops.Multimodal.videoFrameHashes]]: AVI payloads take the
  * container arm above; everything else takes the byte-stride arm
  * (ceil(len/frameBytes) fixed-size slices, every stride-th hashed) —
  * bit-for-bit the previous declarative `substr` + `dhashDecoded`
  * form (pinned by `AviDecodeSpec`'s byte-arm parity test), so every existing gate oracle
  * replays unchanged. Fusing both arms into one `StaticInvoke` also
  * removes the per-frame substring materialization and sidesteps the
  * when-branch CSE trap an `isAvi ? containerArm : byteArm` Column
  * tree would hit (the round-8 class).
  */
object AviDecodeImpl {

  /** Frame-walk cap = the composite-key frame budget (see scaladoc). */
  val MaxFrames: Int = 4096

  /** Sampled per-frame perceptual hashes: container frames for AVIs,
    * byte-stride slices otherwise (see object scaladoc). Empty payload
    * → empty array (no frames). Never throws on hostile bytes. */
  def videoHashes63(b: Array[Byte], frameBytes: Int, stride: Int): ArrayData = {
    // caller-contract guard (the Column API has no build-time require —
    // its args are Columns): stride=0 would divide by zero, a negative
    // stride would allocate a negative-size array — surface the bug
    // typed instead
    if (frameBytes < 1 || stride < 1)
      throw new IllegalArgumentException(
        s"videoHashes63: frameBytes and stride must be >= 1 (got $frameBytes, $stride)")
    if (b == null) return null
    val spans = aviFrameSpans(b)
    if (spans != null) {
      val n = spans.length / 2
      val out = new Array[Long]((n + stride - 1) / stride)
      var k = 0
      var f = 0
      while (f < n) {
        val at = spans(2 * f)
        val len = spans(2 * f + 1)
        val frame = java.util.Arrays.copyOfRange(b, at, at + len)
        out(k) = PngDecodeImpl.dhashDecoded63(frame)
        k += 1
        f += stride
      }
      new GenericArrayData(out)
    } else {
      // byte-stride arm: ceil(len/frameBytes) slices, every stride-th;
      // slice f covers [f*frameBytes, min(len, (f+1)*frameBytes)) —
      // exactly substr(payload, f*frameBytes + 1, frameBytes)
      val len = b.length
      val nFrames = (len.toLong + frameBytes - 1) / frameBytes
      if (nFrames == 0) return new GenericArrayData(Array.emptyLongArray)
      val sampled = ((nFrames + stride - 1) / stride).toInt
      val out = new Array[Long](sampled)
      var k = 0
      var f = 0L
      while (f < nFrames) {
        val at = (f * frameBytes).toInt
        val hi = math.min(len.toLong, (f + 1) * frameBytes).toInt
        out(k) = PngDecodeImpl.dhashDecoded63(
          java.util.Arrays.copyOfRange(b, at, hi))
        k += 1
        f += stride
      }
      new GenericArrayData(out)
    }
  }

  /** All stream-0 video frames of an AVI payload as byte slices, or
    * null when the payload is not an AVI this walker handles — public
    * for specs and for operators that want the raw frames (model-sized
    * use only; the hashing path never materializes unsampled frames). */
  def aviFrames(b: Array[Byte]): Array[Array[Byte]] = {
    val spans = aviFrameSpans(b)
    if (spans == null) return null
    Array.tabulate(spans.length / 2) { f =>
      java.util.Arrays.copyOfRange(b, spans(2 * f), spans(2 * f) + spans(2 * f + 1))
    }
  }

  // --- container walk internals ---------------------------------------

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def isTag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** (offset, length) pairs of the stream-0 video chunks in file
    * order, flattened; null when not a well-formed AVI in scope.
    * Wrapped so one hostile row falls back instead of killing the
    * task (the [[PngDecodeImpl.pngLuma]] contract). */
  private[functions] def aviFrameSpans(b: Array[Byte]): Array[Int] =
    try walk(b) catch { case scala.util.control.NonFatal(_) => null }

  private def walk(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 12 ||
        !isTag(b, 0, "RIFF") || !isTag(b, 8, "AVI ")) return null
    val out = new java.util.ArrayList[Int](64)
    var sawMovi = false
    var i = 12
    while (i + 8 <= b.length) {
      val size = u32le(b, i + 4)
      val at = i + 8
      if (size < 0 || at + size > b.length) return null
      if (isTag(b, i, "LIST") && size >= 4 && isTag(b, at, "movi")) {
        sawMovi = true
        if (!collectMovi(b, at + 4, at + size.toInt, out, depth = 0)) return null
      }
      i = at + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    // RIFF/AVI magic without a movi list = not a playable AVI; let the
    // byte model grade it rather than emitting a zero-frame video
    if (!sawMovi) return null
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    arr
  }

  /** Walks `movi` (or a nested `rec ` group) body chunks, appending
    * (offset, length) for each `00dc`/`00db`; false on corrupt sizes. */
  private def collectMovi(b: Array[Byte], from: Int, end: Int,
      out: java.util.ArrayList[Int], depth: Int): Boolean = {
    var i = from
    while (i + 8 <= end && out.size < 2 * MaxFrames) {
      val size = u32le(b, i + 4)
      val at = i + 8
      if (size < 0 || at + size > end) return false
      if (isTag(b, i, "LIST") && size >= 4 && isTag(b, at, "rec ")) {
        if (depth >= 1) return false // rec-in-rec is out of scope
        if (!collectMovi(b, at + 4, at + size.toInt, out, depth + 1)) return false
      } else if (b(i) == '0' && b(i + 1) == '0' && b(i + 2) == 'd' &&
          (b(i + 3) == 'c' || b(i + 3) == 'b')) {
        out.add(at)
        out.add(size.toInt)
      }
      i = at + size.toInt + (size.toInt & 1)
    }
    true
  }
}

/** Column surface for [[AviDecodeImpl]] — a `StaticInvoke` kernel that
  * inlines into whole-stage codegen; null payloads propagate null. */
object AviDecode {

  private val AL = ArrayType(LongType, containsNull = false)

  private[functions] def hashesExpr(b: Expression, frameBytes: Expression,
      stride: Expression): Expression =
    StaticInvoke(AviDecodeImpl.getClass, AL, "videoHashes63",
      Seq(b, frameBytes, stride), Seq(BinaryType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true)

  /** Sampled per-frame 63-bit perceptual hashes (container frames for
    * AVIs, byte-stride slices otherwise); sampled frame k corresponds
    * to original frame index `k * stride` in BOTH arms. */
  def videoHashes(payload: Column, frameBytes: Column, stride: Column): Column =
    ColumnBridge.column(hashesExpr(ColumnBridge.expression(payload),
      ColumnBridge.expression(frameBytes.cast("int")),
      ColumnBridge.expression(stride.cast("int"))))
}
