package graft.functions

import java.util.zip.Inflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Zero-dependency PNG pixel decode feeding the perceptual hash —
  * closes the one documented stub in the multimodal tier: byte-level
  * dHash only survives a byte-identical payload, while a real
  * re-encode of the SAME pixels (different zlib level, different
  * scanline filters) changes most payload bytes. Decoding to the luma
  * plane first makes [[PerceptualHashImpl.dhash63]] a function of the
  * IMAGE, not of the compressor. The reference has nothing here
  * (blobs are stringified — `filesql.go:649-707`); the decode is pure
  * public-spec byte work: PNG chunks + scanline filters per the W3C
  * PNG specification, zlib via `java.util.zip.Inflater`.
  *
  * Scope (anything else falls back to bytes-as-luma, never throws):
  *   - 8-bit depth, non-interlaced, compression 0 / filter method 0
  *     (the only values the spec defines),
  *   - color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  *     6 (RGBA); alpha is ignored (a dedup signal, not compositing),
  *   - luma = (77·R + 150·G + 29·B + 128) >> 8 — the integer BT.601
  *     weights scaled to sum to 256, exact and engine-portable,
  *   - decode cap 2²⁴ pixels (≈ 4K×4K): a corrupt/hostile IHDR on one
  *     row of a 100 TB corpus must not allocate unbounded buffers —
  *     over-cap images fall back to bytes-as-luma (filterable via
  *     [[MediaHeaders.mediaWidth]]/[[MediaHeaders.mediaHeight]], which
  *     parse the header without allocating the image),
  *   - chunk CRCs are NOT validated (lenient contract, like
  *     [[MediaHeadersImpl]]): a bit-flipped IDAT decodes to slightly
  *     wrong pixels — which is exactly the near-dup-tolerant case —
  *     rather than discarding the decode.
  *
  * The fused [[dhashDecoded63]] static keeps decode+hash ONE codegen
  * call so the luma plane lives only inside the call frame — never a
  * column in the plan, never shuffled.
  */
object PngDecodeImpl {

  /** Decode cap: images over 2²⁴ pixels fall back to bytes-as-luma. */
  val MaxPixels: Long = 1L << 24

  /** 63-bit dHash over the decoded pixel luma plane (PNG via this
    * decoder, baseline JPEG via [[JpegDecodeImpl]]), or over the raw
    * payload bytes otherwise — the "real deployment" contract
    * [[PerceptualHashImpl]]'s scaladoc promised, with the hash
    * arithmetic itself UNCHANGED. */
  def dhashDecoded63(b: Array[Byte]): Long =
    PerceptualHashImpl.dhash63(lumaOrBytes(b))

  /** Decoded luma plane for decodable PNGs and baseline JPEGs; the
    * payload itself otherwise (bytes-as-luma fallback). The format
    * probes are ordered cheapest-reject first — each one bails on its
    * magic bytes, so a non-media payload pays two integer compares. */
  def lumaOrBytes(b: Array[Byte]): Array[Byte] = {
    val l = pngLuma(b)
    if (l != null) l
    else {
      val j = JpegDecodeImpl.jpegLuma(b)
      if (j != null) j else b
    }
  }

  /** Row-major 8-bit luma plane, or null when the payload is not a
    * PNG this decoder handles (wrong depth/interlace, truncated,
    * over-cap, corrupt zlib stream...). Never throws: one bad row in
    * a 100 TB corpus yields the fallback, not a dead job. */
  def pngLuma(b: Array[Byte]): Array[Byte] =
    try decode(b) catch { case scala.util.control.NonFatal(_) => null }

  // --- decoding internals -------------------------------------------

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def isType(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def decode(b: Array[Byte]): Array[Byte] = {
    if (!isPng(b)) return null
    var w = 0; var h = 0; var colorType = -1
    var plte: Array[Byte] = null
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var end = false
    while (!end && i + 8 <= b.length) {
      val len = u32(b, i)
      val dataAt = i + 8
      if (len > Int.MaxValue - 12L || dataAt + len + 4 > b.length) return null
      val n = len.toInt
      if (isType(b, i + 4, "IHDR")) {
        if (n != 13) return null
        val width = u32(b, dataAt)
        val height = u32(b, dataAt + 4)
        val bitDepth = b(dataAt + 8) & 0xFF
        colorType = b(dataAt + 9) & 0xFF
        val compression = b(dataAt + 10) & 0xFF
        val filterMethod = b(dataAt + 11) & 0xFF
        val interlace = b(dataAt + 12) & 0xFF
        // per-dimension caps BEFORE the product: width/height are u32s
        // up to 2³²−1, so a hostile IHDR could wrap width·height past
        // 2⁶³ and sneak under the pixel cap into a giant allocation
        // (OutOfMemoryError is not NonFatal — it would kill the task,
        // not fall back)
        if (width < 1 || height < 1 ||
            width > MaxPixels || height > MaxPixels ||
            width * height > MaxPixels ||
            bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0 ||
            !(colorType == 0 || colorType == 2 || colorType == 3 ||
              colorType == 4 || colorType == 6)) return null
        w = width.toInt; h = height.toInt; sawIhdr = true
      } else if (isType(b, i + 4, "PLTE")) {
        plte = java.util.Arrays.copyOfRange(b, dataAt, dataAt + n)
      } else if (isType(b, i + 4, "IDAT")) {
        idat.write(b, dataAt, n)
      } else if (isType(b, i + 4, "IEND")) {
        end = true
      }
      i = dataAt + n + 4
    }
    if (!sawIhdr || idat.size() == 0) return null
    val channels = colorType match {
      case 0 | 3 => 1
      case 4     => 2
      case 2     => 3
      case _     => 4
    }
    val bpl = w * channels
    // ≤ (2²⁴·4 + 2²⁴) + … — fits an Int at the MaxPixels cap
    val raw = new Array[Byte]((bpl + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    var stuck = false
    while (off < raw.length && !inf.finished() && !stuck) {
      val got = inf.inflate(raw, off, raw.length - off)
      if (got == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
      off += got
    }
    inf.end()
    if (off != raw.length) return null // truncated / undersized stream
    unfilter(raw, w, h, channels)
    toLuma(raw, w, h, channels, colorType, plte)
  }

  /** In-place scanline unfilter (PNG filter types 0–4); throws on an
    * undefined filter byte (caught by [[pngLuma]] → fallback). */
  private def unfilter(raw: Array[Byte], w: Int, h: Int, bpp: Int): Unit = {
    val bpl = w * bpp
    var y = 0
    while (y < h) {
      val rs = y * (bpl + 1) + 1 // first data byte of this scanline
      val ps = rs - (bpl + 1)    // same byte, previous scanline
      val ft = raw(rs - 1) & 0xFF
      var x = 0
      ft match {
        case 0 => ()
        case 1 => // Sub
          x = bpp
          while (x < bpl) {
            raw(rs + x) = (raw(rs + x) + raw(rs + x - bpp)).toByte; x += 1
          }
        case 2 => // Up
          if (y > 0) {
            while (x < bpl) {
              raw(rs + x) = (raw(rs + x) + raw(ps + x)).toByte; x += 1
            }
          }
        case 3 => // Average
          while (x < bpl) {
            val left = if (x >= bpp) raw(rs + x - bpp) & 0xFF else 0
            val up = if (y > 0) raw(ps + x) & 0xFF else 0
            raw(rs + x) = (raw(rs + x) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < bpl) {
            val a = if (x >= bpp) raw(rs + x - bpp) & 0xFF else 0
            val u = if (y > 0) raw(ps + x) & 0xFF else 0
            val c = if (x >= bpp && y > 0) raw(ps + x - bpp) & 0xFF else 0
            raw(rs + x) = (raw(rs + x) + paeth(a, u, c)).toByte
            x += 1
          }
        case _ => throw new IllegalArgumentException(s"filter $ft")
      }
      y += 1
    }
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def toLuma(raw: Array[Byte], w: Int, h: Int, channels: Int,
      colorType: Int, plte: Array[Byte]): Array[Byte] = {
    val bpl = w * channels
    val out = new Array[Byte](w * h)
    var p = 0
    var y = 0
    if (colorType == 0 || colorType == 4) {
      while (y < h) {
        val rs = y * (bpl + 1) + 1
        var x = 0
        while (x < w) { out(p) = raw(rs + x * channels); p += 1; x += 1 }
        y += 1
      }
    } else if (colorType == 2 || colorType == 6) {
      while (y < h) {
        val rs = y * (bpl + 1) + 1
        var x = 0
        while (x < w) {
          val o = rs + x * channels
          out(p) = luma(raw(o) & 0xFF, raw(o + 1) & 0xFF, raw(o + 2) & 0xFF)
          p += 1; x += 1
        }
        y += 1
      }
    } else { // 3: palette
      if (plte == null || plte.length % 3 != 0) return null
      val nPal = plte.length / 3
      while (y < h) {
        val rs = y * (bpl + 1) + 1
        var x = 0
        while (x < w) {
          val idx = raw(rs + x) & 0xFF
          if (idx >= nPal) return null
          out(p) = luma(plte(idx * 3) & 0xFF, plte(idx * 3 + 1) & 0xFF,
            plte(idx * 3 + 2) & 0xFF)
          p += 1; x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Integer BT.601 luma; 77 + 150 + 29 = 256 so the shift is exact. */
  private def luma(r: Int, g: Int, b: Int): Byte =
    ((77 * r + 150 * g + 29 * b + 128) >> 8).toByte
}

/** Column surface for the decoded perceptual hash. */
object PngDecode {

  private[functions] def dhashDecodedExpr(b: Expression): Expression =
    StaticInvoke(PngDecodeImpl.getClass, LongType, "dhashDecoded63",
      Seq(b), Seq(BinaryType), propagateNull = true, returnNullable = false)

  /** 63-bit perceptual difference-hash over DECODED pixels for PNG
    * payloads (luma plane through the unchanged
    * [[PerceptualHashImpl.dhash63]]) and over raw bytes otherwise —
    * what every phash op uses by default: re-encoded PNGs of the same
    * pixels hash identically, and non-image payloads keep the
    * documented bytes-as-luma behavior. */
  def dhashDecoded(payload: Column): Column =
    ColumnBridge.column(dhashDecodedExpr(ColumnBridge.expression(payload)))
}
