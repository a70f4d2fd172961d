package graft.functions

/** Zero-dependency BASELINE JPEG luma decode — the second leg of the
  * real-pixel perceptual tier ([[PngDecodeImpl]] is the first): a
  * re-compressed JPEG of the same image changes essentially every
  * payload byte, so bytes-as-luma dHash misses it; decoding to the Y
  * plane makes the fingerprint a function of the IMAGE again. Pure
  * public-spec byte work (ITU-T T.81 baseline sequential process):
  * segment walk, canonical Huffman decode, dequantize, separable
  * 8×8 IDCT. The CHROMA planes are Huffman-decoded (the bitstream
  * interleaves them) but never dequantized, transformed, or stored —
  * dHash needs luma only.
  *
  * Scope (anything else yields null → the bytes-as-luma fallback,
  * never throws):
  *   - baseline / extended sequential DCT, Huffman coded (SOF0/SOF1);
  *     progressive (SOF2), lossless, arithmetic, hierarchical → null,
  *   - 8-bit precision, 1 or 3 components, ONE interleaved scan
  *     covering all frame components (the layout every mainstream
  *     encoder emits), luma at the maximal sampling factor
  *     (4:4:4 / 4:2:2 / 4:2:0 all qualify),
  *   - restart markers (DRI) honored; 0xFF00 byte stuffing unstuffed,
  *   - pixel product capped at 2²⁴ — the [[PngDecodeImpl]]
  *     hostile-header rule (an OutOfMemoryError is not NonFatal; it
  *     would kill the task instead of falling back); SOF dims are u16,
  *     so unlike PNG's u32 dims the product cannot wrap a long and
  *     needs no per-dimension pre-checks,
  *   - truncated entropy data → null (the PNG truncated-stream
  *     contract), with one lenience: missing EOI after the final MCU
  *     is tolerated (cameras emit it, some proxies strip it).
  *
  * The IDCT runs in doubles; its rounding is JVM-deterministic, and no
  * oracle ever replays a JPEG decode (gate fixtures are sawtooth/PNG
  * payloads — this path is spec-verified against the JDK's own
  * ImageIO codec instead, the independent-reference strategy
  * PngDecodeSpec uses with its independent encoder).
  */
object JpegDecodeImpl {

  /** Decode cap, shared with the PNG leg. */
  val MaxPixels: Long = PngDecodeImpl.MaxPixels

  /** Row-major 8-bit luma plane, or null when the payload is not a
    * baseline JPEG this decoder handles. Never throws. */
  def jpegLuma(b: Array[Byte]): Array[Byte] =
    try decode(b) catch { case scala.util.control.NonFatal(_) => null }

  // --- decoding internals -------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · (u == 0 ? 1/√2 : 1) — the separable IDCT
    * basis with the normalization folded in. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) *
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  }

  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    // canonical per-length decode tables (T.81 F.2.2.3 DECODE)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valPtr(l) + code - minCode(l)) & 0xFF
  }

  private final class Reader(b: Array[Byte], var pos: Int) {
    private var bits = 0
    private var acc = 0
    def nextBit(): Int = {
      if (bits == 0) {
        if (pos >= b.length) throw new IllegalArgumentException("eof")
        val v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) throw new IllegalArgumentException("eof")
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed FF
          else throw new IllegalArgumentException("marker in stream")
        }
        acc = v
        bits = 8
      }
      bits -= 1
      (acc >> bits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(l, code)
        code = (code << 1) | nextBit()
        l += 1
      }
      throw new IllegalArgumentException("bad huffman code")
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      bits = 0
      // tolerate fill bytes before the marker
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
        (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF ||
          ((b(pos + 1) & 0xFF) & 0xF8) != 0xD0)
        throw new IllegalArgumentException("missing restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  // per-component frame info
  private final class Comp(val h: Int, val v: Int, val tq: Int) {
    var dcTab = -1
    var acTab = -1
    var pred = 0
  }

  private def decode(b: Array[Byte]): Array[Byte] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return null
    val qt = new Array[Array[Int]](4) // zigzag order, as read
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var dri = 0
    var i = 2
    var scanAt = -1
    while (scanAt < 0) {
      // seek the next marker, tolerating fill bytes
      if (i + 1 >= b.length) return null
      if ((b(i) & 0xFF) != 0xFF) return null
      while (i + 1 < b.length && (b(i + 1) & 0xFF) == 0xFF) i += 1
      val m = b(i + 1) & 0xFF
      i += 2
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) {
        // standalone marker: nothing to read
      } else {
        if (i + 1 >= b.length) return null
        val len = u16(b, i)
        val at = i + 2
        val end = i + len
        if (len < 2 || end > b.length) return null
        m match {
          case 0xDB => // DQT
            var p = at
            while (p < end) {
              val pq = (b(p) & 0xF0) >> 4
              val tq2 = b(p) & 0x0F
              p += 1
              if (tq2 > 3 || pq > 1) return null
              // a lying DQT length must not read the NEXT segment's bytes
              // into the quant table (the post-loop p != end check or a
              // caught AIOOBE would reject it eventually, but only by
              // accident near the buffer end) — mirror the DHT path's
              // explicit pre-checks
              if (p + (if (pq == 0) 64 else 128) > end) return null
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) b(p + k) & 0xFF else u16(b, p + 2 * k)
                k += 1
              }
              qt(tq2) = t
              p += (if (pq == 0) 64 else 128)
            }
            if (p != end) return null
          case 0xC4 => // DHT
            var p = at
            while (p < end) {
              val tc = (b(p) & 0xF0) >> 4
              val th = b(p) & 0x0F
              p += 1
              if (tc > 1 || th > 3 || p + 16 > end) return null
              val counts = Array.tabulate(16)(k => b(p + k) & 0xFF)
              p += 16
              val n = counts.sum
              if (n > 256 || p + n > end) return null
              val vals = java.util.Arrays.copyOfRange(b, p, p + n)
              p += n
              val t = new Huff(counts, vals)
              if (tc == 0) dcH(th) = t else acH(th) = t
            }
            if (p != end) return null
          case 0xC0 | 0xC1 => // SOF0 / SOF1: baseline & extended sequential
            if (comps != null) return null
            val prec = b(at) & 0xFF
            h = u16(b, at + 1); w = u16(b, at + 3)
            val nc = b(at + 5) & 0xFF
            // pixel-product cap (hostile-header rule). Unlike PNG's u32
            // dimensions, SOF dims are u16 (≤ 65535 each), so the
            // product maxes at ~4.3e9 — it can neither wrap a long nor
            // need per-dimension pre-checks; the single product compare
            // is the whole guard
            if (prec != 8 || w < 1 || h < 1 ||
                w.toLong * h > MaxPixels ||
                !(nc == 1 || nc == 3)) return null
            comps = Array.tabulate(nc) { c =>
              val o = at + 6 + 3 * c
              val hv = b(o + 1) & 0xFF
              // Tq read UNMASKED so a nonconforming byte (0x13) fails
              // the > 3 check below instead of silently aliasing table 3
              new Comp((hv >> 4) & 0x0F, hv & 0x0F, b(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
                c.tq > 3)) return null
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null // progressive / lossless / arithmetic / hierarchical
          case 0xDD => // DRI
            if (len != 4) return null
            dri = u16(b, at)
          case 0xDA => // SOS
            if (comps == null) return null
            val ns = b(at) & 0xFF
            if (ns != comps.length) return null // one interleaved scan only
            var c = 0
            while (c < ns) {
              // scan components matched positionally: they must arrive
              // in frame order (the layout every mainstream encoder
              // emits); component ids themselves are not re-checked
              val tt = b(at + 2 + 2 * c) & 0xFF
              comps(c).dcTab = (tt >> 4) & 0x0F
              comps(c).acTab = tt & 0x0F
              c += 1
            }
            scanAt = end // entropy data starts after Ss/Se/AhAl bytes
          case 0xD9 => return null // EOI before any scan
          case _ => () // APPn / COM / others: skip
        }
        i = end
      }
    }
    // T.81 A.2: a ONE-component scan is NON-interleaved — the MCU is a
    // single 8×8 data unit tiling in raster order and the SOF sampling
    // factors do not shape the layout (a reviewer caught the first cut
    // laying grayscale JPEGs with H=V=2 out in interleaved tiles:
    // decode "succeeded" with a block-scrambled plane — silently wrong
    // is worse than the null fallback). Effective factors: 1 for the
    // single-component case, the declared ones otherwise.
    val single = comps.length == 1
    def eh(c: Comp): Int = if (single) 1 else c.h
    def ev(c: Comp): Int = if (single) 1 else c.v
    val hmax = comps.map(eh).max
    val vmax = comps.map(ev).max
    val y0 = comps(0)
    // luma must carry the maximal factor so its blocks are 1:1 pixels
    if (eh(y0) != hmax || ev(y0) != vmax) return null
    if (comps.exists(c => c.dcTab > 3 || c.acTab > 3 ||
        dcH(c.dcTab) == null || acH(c.acTab) == null || qt(c.tq) == null))
      return null
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val luma = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val deq = new Array[Double](64)
    val r = new Reader(b, scanAt)
    val yq = qt(y0.tq)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        r.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val cc = comps(c)
        val isLuma = c == 0
        val dc = dcH(cc.dcTab); val ac = acH(cc.acTab)
        var by = 0
        while (by < ev(cc)) {
          var bx = 0
          while (bx < eh(cc)) {
            // Huffman-decode one block; only luma keeps coefficients
            // (chroma must still be decoded to advance the bitstream,
            // but skips the fill/stores entirely)
            if (isLuma) java.util.Arrays.fill(coef, 0)
            val t = r.decode(dc)
            if (t > 15) throw new IllegalArgumentException("bad dc size")
            cc.pred += extend(r.receive(t), t)
            if (isLuma) coef(0) = cc.pred
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.decode(ac)
              val run = (rs >> 4) & 0x0F
              val sz = rs & 0x0F
              if (sz == 0) {
                if (run == 15) k += 16 else eob = true
              } else {
                k += run
                if (k > 63) throw new IllegalArgumentException("ac overflow")
                val v = extend(r.receive(sz), sz)
                if (isLuma) coef(k) = v
                k += 1
              }
            }
            if (isLuma) {
              idctInto(coef, yq, tmp, deq, luma, w, h,
                (mx * eh(cc) + bx) * 8, (my * ev(cc) + by) * 8)
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    luma
  }

  /** Dequantize (zigzag-ordered coefficients × zigzag-ordered table),
    * separable 2-D IDCT, level-shift, clamp, and scatter the 8×8 block
    * into the luma plane (edge blocks clipped). */
  private def idctInto(coefZz: Array[Int], qtZz: Array[Int],
      tmp: Array[Double], f: Array[Double], out: Array[Byte], w: Int, h: Int,
      ox: Int, oy: Int): Unit = {
    // dequantize + de-zigzag into natural order (f is a hoisted
    // scratch buffer — a cap-sized plane is 262k blocks, so per-block
    // allocation would churn the hot path)
    var k = 0
    while (k < 64) {
      f(ZigZag(k)) = coefZz(k).toDouble * qtZz(k)
      k += 1
    }
    // rows: tmp[v][x] = 1/2 Σu Cu f[v][u] cos((2x+1)uπ/16)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += f(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    // cols + level shift + clamp + scatter
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += tmp(u * 8 + x) * Cos(y)(u); u += 1 }
        val px = ox + x; val py = oy + y
        if (px < w && py < h) {
          val value = math.round(s / 2.0 + 128.0).toInt
          out(py * w + px) =
            (if (value < 0) 0 else if (value > 255) 255 else value).toByte
        }
        y += 1
      }
      x += 1
    }
  }
}
