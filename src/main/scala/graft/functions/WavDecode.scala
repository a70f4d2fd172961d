package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}

/** Zero-dependency WAV (RIFF/PCM) decode — the audio leg of the
  * multimodal tier, mirroring [[PngDecodeImpl]]'s role for images: the
  * payload column stops being an opaque blob and yields REAL samples,
  * so loudness/silence features and the perceptual fingerprint are
  * functions of the AUDIO, not of the container bytes. The reference
  * has nothing here (blobs are stringified — `filesql.go:649-707`);
  * the parse is pure public-spec byte work (RIFF chunk walk, PCM
  * sample layout per the WAVE format specification) — no audio
  * libraries exist in this container and none are needed for PCM.
  *
  * Scope (anything else yields null → filterable, never fatal):
  *   - RIFF/WAVE container, `fmt ` chunk with audioFormat 1 (PCM),
  *   - 8-bit (unsigned, rebased to signed) or 16-bit (signed LE)
  *     samples, 1..64 channels mixed to mono via truncating division
  *     (DuckDB `//` truncates toward zero too — probe-verified — so a
  *     signed mix replays exactly cross-engine),
  *   - chunks are word-aligned (odd sizes padded); unknown chunks
  *     (LIST, fact, cue...) are skipped; `fmt `/`data` may arrive in
  *     either order; the FIRST data chunk wins,
  *   - guards BEFORE allocation (the hostile-IHDR rule from
  *     [[PngDecodeImpl]]): declared chunk sizes are checked against
  *     the actual buffer, channel count capped at 64, mono sample
  *     count capped at 2²⁶ (~128 MiB of shorts) — a corrupt header on
  *     one row of a 100 TB corpus must not allocate unbounded buffers,
  *   - a data chunk whose size is not a whole number of frames is
  *     corrupt → null (the PNG truncated-stream contract).
  *
  * The fingerprint [[afp63]] is the dHash construction transplanted to
  * the sample domain: 64 box windows over the mono signal BIASED by
  * +32768 (≥ 0 for every PCM depth this decoder emits), window value =
  * sum / width, 63 adjacent-comparison bits. The bias is the
  * portability move: DuckDB `//` TRUNCATES toward zero (probe-verified
  * `-7 // 2 = -3` — matching Scala `/`, NOT flooring), so signed
  * window sums would replay differently; on the biased non-negative
  * sums truncation ≡ floor division, and floor division shifts every
  * window by exactly the bias, so the comparison bits are IDENTICAL to
  * floor-div on the raw signal. Two properties follow:
  *   - EXACT invariance under an integer DC offset (re-recorded at a
  *     different bias): the offset shifts every window value by
  *     exactly the offset, so no comparison flips,
  *   - on the bytes-as-samples fallback (non-WAV payloads, values
  *     0..255 → biased 32768..33023) it coincides BIT-FOR-BIT with
  *     [[PerceptualHashImpl.dhash63]] — the bias shifts all 64 cells
  *     uniformly — so audio and image fingerprints share one
  *     banding/index vocabulary ([[graft.ops.Dedup.simhashPairs]],
  *     the phash index family).
  */
object WavDecodeImpl {

  /** Mono-sample cap: decodes over 2²⁶ samples yield null. */
  val MaxSamples: Long = 1L << 26

  /** Channel-count cap (hostile fmt guard, before any allocation). */
  val MaxChannels: Int = 64

  /** Stat vector layout returned by [[wavStats]]. */
  val StatNames: Seq[String] = Seq("sample_rate", "channels", "bits",
    "n_samples", "duration_ms", "mean_abs", "peak_abs",
    "lead_silence", "trail_silence")

  /** Decode + feature-extract in ONE call (the [[PngDecodeImpl]]
    * fused-kernel rule: the sample buffer lives only in the call
    * frame — never a column in the plan, never shuffled). Returns the
    * [[StatNames]] long vector, or null when the payload is not a
    * decodable PCM WAV. A sample is "silent" iff |s| ≤ silenceAbsMax;
    * durations and means use floor division (non-negative here, but
    * floorDiv keeps the contract uniform). */
  def wavStats(b: Array[Byte], silenceAbsMax: Long): ArrayData = {
    val parsed = parse(b)
    if (parsed == null) return null
    val s = parsed.samples
    val n = s.length
    var sumAbs = 0L
    var peak = 0L
    var i = 0
    while (i < n) {
      val a = math.abs(s(i))
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    var lead = 0
    while (lead < n && math.abs(s(lead)) <= silenceAbsMax) lead += 1
    var trail = 0
    // a fully-silent signal counts ONCE: trail covers what lead didn't
    while (trail < n - lead && math.abs(s(n - 1 - trail)) <= silenceAbsMax)
      trail += 1
    new GenericArrayData(Array[Long](
      parsed.rate, parsed.channels, parsed.bits, n,
      if (n == 0) 0L else n.toLong * 1000L / parsed.rate,
      if (n == 0) 0L else sumAbs / n,
      peak, lead, trail))
  }

  /** 63-bit perceptual audio fingerprint: decoded mono samples through
    * [[afp63]] for PCM WAVs; unsigned payload bytes as the signal
    * otherwise (= [[PerceptualHashImpl.dhash63]] bit-for-bit — see the
    * object scaladoc). Never throws, never null on non-null input. */
  def afpWav63(b: Array[Byte]): Long = {
    val parsed = parse(b)
    if (parsed != null) afp63(parsed.samples)
    // delegate, don't re-materialize: an Array[Long](b.length) staging
    // copy would be an UNCAPPED 8× allocation on a hostile non-WAV
    // blob (OutOfMemoryError is not NonFatal — the round-10 decoder
    // rule), and the bit-for-bit coincidence is exactly dhash63's
    // arithmetic anyway (spec-pinned)
    else PerceptualHashImpl.dhash63(b)
  }

  /** Sample bias making every fingerprint window sum non-negative
    * (see the object scaladoc — truncation ≡ floor there, and the
    * bits are identical to floor-div on the raw signal). */
  val Bias: Long = 32768L

  /** dHash over an arbitrary integer signal with values ≥ −[[Bias]]:
    * 64 box windows [j·n/64, max(j·n/64 + 1, (j+1)·n/64)), window
    * value = Σ(s_i + Bias) / width (truncating — non-negative by the
    * bias), bit j = 1 iff w_j > w_{j+1}, bits 0..62 (63-bit for the
    * overflow-checked-shift oracle contract — [[PerceptualHashImpl]]
    * scaladoc). 0 for an empty signal. */
  def afp63(s: Array[Long]): Long = {
    val n = s.length
    if (n == 0) return 0L
    val w = new Array[Long](64)
    var j = 0
    while (j < 64) {
      val lo = (j.toLong * n / 64).toInt
      var hi = ((j + 1).toLong * n / 64).toInt
      if (hi <= lo) hi = lo + 1
      var sum = 0L
      var i = lo
      while (i < hi) { sum += s(i) + Bias; i += 1 }
      w(j) = sum / (hi - lo)
      j += 1
    }
    var h = 0L
    j = 0
    while (j < 63) {
      if (w(j) > w(j + 1)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Decoded mono samples, or null when not a decodable PCM WAV —
    * public for specs and for operators that want the raw signal. */
  def monoSamples(b: Array[Byte]): Array[Long] = {
    val parsed = parse(b)
    if (parsed == null) null else parsed.samples
  }

  // --- decoding internals -------------------------------------------

  private final class Parsed(val rate: Long, val channels: Long,
      val bits: Long, val samples: Array[Long])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def isTag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Chunk walk + PCM decode; null on anything outside the documented
    * scope. Wrapped so one hostile row falls back instead of killing
    * the task ([[PngDecodeImpl.pngLuma]] contract). */
  private def parse(b: Array[Byte]): Parsed =
    try decode(b) catch { case scala.util.control.NonFatal(_) => null }

  private def decode(b: Array[Byte]): Parsed = {
    if (b == null || b.length < 12 ||
        !isTag(b, 0, "RIFF") || !isTag(b, 8, "WAVE")) return null
    var fmtOk = false
    var channels = 0; var rate = 0L; var bits = 0
    var dataAt = -1; var dataLen = 0
    var i = 12
    while (i + 8 <= b.length && (dataAt < 0 || !fmtOk)) {
      val size = u32le(b, i + 4)
      val at = i + 8
      // declared size checked against the REAL buffer before any use
      if (size < 0 || at + size > b.length) return null
      val n = size.toInt
      if (isTag(b, i, "fmt ")) {
        if (n < 16) return null
        val audioFormat = u16le(b, at)
        channels = u16le(b, at + 2)
        rate = u32le(b, at + 4)
        bits = u16le(b, at + 14)
        if (audioFormat != 1 || channels < 1 || channels > MaxChannels ||
            rate < 1 || rate > 10000000L ||
            !(bits == 8 || bits == 16)) return null
        fmtOk = true
      } else if (isTag(b, i, "data") && dataAt < 0) {
        dataAt = at; dataLen = n
      }
      i = at + n + (n & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataAt < 0) return null
    val bytesPerSample = bits / 8
    val frame = channels * bytesPerSample
    if (dataLen % frame != 0) return null // ragged tail = corrupt
    val nFrames = dataLen / frame
    if (nFrames > MaxSamples) return null
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var sum = 0L
      var c = 0
      while (c < channels) {
        val o = dataAt + f * frame + c * bytesPerSample
        sum += (if (bits == 16) (u16le(b, o) << 16 >> 16).toLong // sign-extend
                else (b(o) & 0xFF) - 128L) // 8-bit WAV is unsigned
        c += 1
      }
      // truncating division — DuckDB // truncates too (probe-verified),
      // so a signed multi-channel mix replays exactly
      out(f) = if (channels == 1) sum else sum / channels
      f += 1
    }
    new Parsed(rate, channels, bits, out)
  }
}

/** Column surface for [[WavDecodeImpl]] — `StaticInvoke` kernels that
  * inline into whole-stage codegen; null payloads propagate null. */
object WavDecode {

  private val AL = ArrayType(LongType, containsNull = false)

  private[functions] def statsExpr(b: Expression, thresh: Expression): Expression =
    StaticInvoke(WavDecodeImpl.getClass, AL, "wavStats",
      Seq(b, thresh), Seq(BinaryType, LongType),
      propagateNull = true, returnNullable = true)

  private[functions] def afpExpr(b: Expression): Expression =
    StaticInvoke(WavDecodeImpl.getClass, LongType, "afpWav63",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  /** [[WavDecodeImpl.StatNames]] long vector for a PCM WAV payload;
    * null for anything else (filterable, never fatal). */
  def stats(payload: Column, silenceAbsMax: Column): Column =
    ColumnBridge.column(statsExpr(ColumnBridge.expression(payload),
      ColumnBridge.expression(silenceAbsMax.cast("long"))))

  /** 63-bit perceptual audio fingerprint (decoded samples for PCM
    * WAVs, bytes-as-samples otherwise — see [[WavDecodeImpl]]). */
  def fingerprint(payload: Column): Column =
    ColumnBridge.column(afpExpr(ColumnBridge.expression(payload)))
}
