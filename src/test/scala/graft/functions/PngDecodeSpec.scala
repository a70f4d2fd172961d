package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** PNG pixel-decode specs: the property the byte-level stub could not
  * deliver — a genuinely re-encoded PNG (different zlib level AND
  * different scanline filters, so most payload bytes change) of the
  * SAME pixels hashes identically through the decoded path, while a
  * different image stays far away; plus format-scope fallbacks and
  * the ops-level wiring (the phash index now decodes by default).
  *
  * The test encoder below is an independent PNG writer (filters
  * applied forward, CRC32 chunks) — the decoder is never tested
  * against bytes it produced itself beyond what the format defines.
  */
class PngDecodeSpec extends SparkSpec {

  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Forward-filter + deflate encoder; filterType applies to every
    * scanline (0/1/2/4 supported — enough to make two encodings of
    * the same pixels byte-disjoint). */
  private def encodePng(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filterType: Int, level: Int, plte: Array[Byte] = null): Array[Byte] = {
    val ch = colorType match { case 0 | 3 => 1; case 4 => 2; case 2 => 3; case _ => 4 }
    val bpl = w * ch
    require(pixels.length == bpl * h, "pixel buffer size")
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(filterType)
      val row = java.util.Arrays.copyOfRange(pixels, y * bpl, (y + 1) * bpl)
      val prev = if (y == 0) new Array[Byte](bpl)
        else java.util.Arrays.copyOfRange(pixels, (y - 1) * bpl, y * bpl)
      val filtered = filterType match {
        case 0 => row
        case 1 => row.zipWithIndex.map { case (v, x) =>
          if (x >= ch) (v - row(x - ch)).toByte else v }
        case 2 => row.zipWithIndex.map { case (v, x) => (v - prev(x)).toByte }
        case 4 => row.zipWithIndex.map { case (v, x) =>
          val a = if (x >= ch) row(x - ch) & 0xFF else 0
          val u = prev(x) & 0xFF
          val c = if (x >= ch) prev(x - ch) & 0xFF else 0
          (v - paeth(a, u, c)).toByte }
        case other => fail(s"unsupported test filter $other")
      }
      raw.write(filtered)
    }
    val defl = new java.util.zip.Deflater(level)
    defl.setInput(raw.toByteArray); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++
      (if (plte != null) chunk("PLTE", plte) else Array.emptyByteArray) ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
  }

  private val W = 48
  private val H = 32

  /** A structured RGB gradient test image. */
  private def rgbPixels(invert: Boolean): Array[Byte] = {
    val px = new Array[Byte](W * H * 3)
    for (y <- 0 until H; x <- 0 until W) {
      val o = (y * W + x) * 3
      val r = (x * 5) % 256; val g = (y * 7) % 256; val b = ((x + y) * 3) % 256
      px(o) = (if (invert) 255 - r else r).toByte
      px(o + 1) = (if (invert) 255 - g else g).toByte
      px(o + 2) = (if (invert) 255 - b else b).toByte
    }
    px
  }

  test("re-encoded PNG of the SAME pixels hashes identically; different image far; raw bytes would miss it") {
    val px = rgbPixels(invert = false)
    // encoding A: no filtering, max compression; encoding B: Paeth
    // rows, fastest compression — same pixels, byte-disjoint payloads
    val encA = encodePng(W, H, 2, px, filterType = 0, level = 9)
    val encB = encodePng(W, H, 2, px, filterType = 4, level = 1)
    assert(!java.util.Arrays.equals(encA, encB))
    assert(java.util.Arrays.equals(
      PngDecodeImpl.pngLuma(encA), PngDecodeImpl.pngLuma(encB)))
    val hA = PngDecodeImpl.dhashDecoded63(encA)
    val hB = PngDecodeImpl.dhashDecoded63(encB)
    assert(ham(hA, hB) == 0, s"re-encode drifted ${ham(hA, hB)} bits")
    // byte-level hashing (the old stub default) sees them as unrelated
    val rawDist = ham(PerceptualHashImpl.dhash63(encA),
      PerceptualHashImpl.dhash63(encB))
    assert(rawDist > 3, s"raw-byte hashes unexpectedly close ($rawDist)")
    // a genuinely different image (inverted gradient) is far away
    val other = encodePng(W, H, 2, rgbPixels(invert = true), 2, 6)
    assert(ham(hA, PngDecodeImpl.dhashDecoded63(other)) > 10)
  }

  test("gray, gray+alpha, RGBA and palette encodings of the same scene agree on luma") {
    // grayscale: luma IS the sample
    val gray = Array.tabulate(W * H)(i => ((i * 11) % 256).toByte)
    val g0 = encodePng(W, H, 0, gray, 1, 6)
    assert(java.util.Arrays.equals(PngDecodeImpl.pngLuma(g0), gray))
    // gray+alpha: alpha ignored
    val ga = new Array[Byte](W * H * 2)
    for (i <- 0 until W * H) { ga(2 * i) = gray(i); ga(2 * i + 1) = (i % 200 + 17).toByte }
    assert(java.util.Arrays.equals(
      PngDecodeImpl.pngLuma(encodePng(W, H, 4, ga, 2, 3)), gray))
    // RGBA vs RGB of the same colors
    val rgb = rgbPixels(invert = false)
    val rgba = new Array[Byte](W * H * 4)
    for (i <- 0 until W * H) {
      rgba(4 * i) = rgb(3 * i); rgba(4 * i + 1) = rgb(3 * i + 1)
      rgba(4 * i + 2) = rgb(3 * i + 2); rgba(4 * i + 3) = (255 - i % 90).toByte
    }
    assert(java.util.Arrays.equals(
      PngDecodeImpl.pngLuma(encodePng(W, H, 6, rgba, 4, 5)),
      PngDecodeImpl.pngLuma(encodePng(W, H, 2, rgb, 0, 9))))
    // palette: 16 colors, indexed pixels == direct RGB of those colors
    val pal = Array.tabulate(16 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val idx = Array.tabulate(W * H)(i => (i % 16).toByte)
    val direct = new Array[Byte](W * H * 3)
    for (i <- 0 until W * H) {
      val c = idx(i) & 0xFF
      direct(3 * i) = pal(3 * c); direct(3 * i + 1) = pal(3 * c + 1)
      direct(3 * i + 2) = pal(3 * c + 2)
    }
    assert(java.util.Arrays.equals(
      PngDecodeImpl.pngLuma(encodePng(W, H, 3, idx, 1, 6, plte = pal)),
      PngDecodeImpl.pngLuma(encodePng(W, H, 2, direct, 0, 6))))
  }

  test("fallback scope: non-PNG, truncated, over-cap, interlaced and 16-bit all fall back to bytes") {
    val notPng = Array.tabulate(300)(i => ((i * 7) % 251).toByte)
    assert(PngDecodeImpl.lumaOrBytes(notPng) eq notPng)
    assert(PngDecodeImpl.dhashDecoded63(notPng) ==
      PerceptualHashImpl.dhash63(notPng))
    val good = encodePng(W, H, 2, rgbPixels(invert = false), 0, 9)
    // truncated mid-IDAT: decode fails, fallback hashes the bytes
    val trunc = java.util.Arrays.copyOfRange(good, 0, good.length / 2)
    assert(PngDecodeImpl.pngLuma(trunc) == null)
    assert(PngDecodeImpl.dhashDecoded63(trunc) ==
      PerceptualHashImpl.dhash63(trunc))
    // hostile IHDR (2^30 x 2^30): over the pixel cap, no allocation blowup
    val hostile = good.clone()
    System.arraycopy(be32(1L << 30), 0, hostile, 16, 4)
    System.arraycopy(be32(1L << 30), 0, hostile, 20, 4)
    assert(PngDecodeImpl.pngLuma(hostile) == null)
    // u32-max dims whose PRODUCT wraps past 2^63: the per-dimension cap
    // must reject before the multiply (a wrapped product would sneak
    // under the pixel cap into a giant allocation)
    val wrap = good.clone()
    System.arraycopy(be32(0xFFFFFFFFL), 0, wrap, 16, 4)
    System.arraycopy(be32(0xC4653600L), 0, wrap, 20, 4)
    assert(PngDecodeImpl.pngLuma(wrap) == null)
    // interlace flag / 16-bit depth: out of scope, fallback
    val inter = good.clone(); inter(28) = 1
    assert(PngDecodeImpl.pngLuma(inter) == null)
    val deep = good.clone(); deep(24) = 16
    assert(PngDecodeImpl.pngLuma(deep) == null)
    // corrupt zlib stream: bad-format exception is caught, fallback
    val badZ = good.clone()
    badZ(good.length - 20) = (badZ(good.length - 20) ^ 0x55).toByte
    PngDecodeImpl.lumaOrBytes(badZ) // must not throw
  }

  test("Column surface + ops wiring: the phash index matches a re-encode, not a new image") {
    val px = rgbPixels(invert = false)
    val encA = encodePng(W, H, 2, px, 0, 9)
    val encB = encodePng(W, H, 2, px, 4, 1)
    val novel = encodePng(W, H, 2, rgbPixels(invert = true), 1, 6)
    // StaticInvoke == direct call; null propagates
    val df = Seq((1L, encA), (2L, encB), (3L, novel),
        (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .withColumn("ph", PngDecode.dhashDecoded(col("payload")))
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(1L) == Some(PngDecodeImpl.dhashDecoded63(encA)))
    assert(got(2L) == Some(PngDecodeImpl.dhashDecoded63(encB)))
    assert(got(4L).isEmpty)
    // ops-level: index the original; a re-encoded probe surfaces at
    // hamming 0, a genuinely new image does not surface at all
    val dir = graft.Paths.scratchDir("graft-png-idx").resolve("idx").toString
    Dedup.writePhashIndex(Seq((10L, encA)).toDF("id", "payload"),
      "id", "payload", dir, maxDistance = 3)
    val probe = Dedup.probePhashIndex(spark, dir,
      Seq((20L, encB), (21L, novel)).toDF("id", "payload"), "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(probe.toSeq == Seq((20L, 10L, 0)), probe.mkString(","))
  }
}
