package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Baseline-JPEG decode specs. The independent reference codec is the
  * JDK's own ImageIO JPEG writer/reader (java.desktop — part of the
  * JDK, not an external media library): the decoder is validated
  * against bytes a REAL encoder produced and pixels a REAL decoder
  * read back, never against its own output. Grayscale images make the
  * comparison sharp (1-component JPEG: ImageIO's raster IS the Y
  * plane this decoder extracts — no chroma conversion in the loop);
  * RGB images exercise the interleaved multi-component scan with
  * chroma blocks Huffman-decoded and discarded.
  */
class JpegDecodeSpec extends SparkSpec {

  import spark.implicits._

  private def encode(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), p)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  private def grayImage(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, px(x, y) & 0xFF)
    img
  }

  private def rgbImage(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  // structured test pattern: global gradient + a bright blob + texture
  private def pattern(x: Int, y: Int): Int = {
    val grad = (x * 3 + y * 2) % 160
    val blob = if ((x - 20) * (x - 20) + (y - 14) * (y - 14) < 64) 80 else 0
    math.min(255, 20 + grad + blob + (x * y) % 7)
  }

  test("grayscale decode matches ImageIO's reference decode within IDCT rounding") {
    for ((w, h) <- Seq((40, 28), (64, 64), (17, 9))) { // incl. non-multiple-of-8
      val bytes = encode(grayImage(w, h)(pattern), 0.9f)
      val mine = JpegDecodeImpl.jpegLuma(bytes)
      assert(mine != null && mine.length == w * h, s"$w x $h decode failed")
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes)).getRaster
      var maxDiff = 0; var sumDiff = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((mine(y * w + x) & 0xFF) - ref.getSample(x, y, 0))
        maxDiff = math.max(maxDiff, d); sumDiff += d
      }
      assert(maxDiff <= 2, s"$w x $h max pixel diff $maxDiff vs reference")
      assert(sumDiff.toDouble / (w * h) <= 1.0, s"mean diff ${sumDiff.toDouble / (w * h)}")
    }
  }

  test("color (3-component interleaved) decode: Y plane tracks BT.601 of the reference") {
    val w = 48; val h = 32
    val img = rgbImage(w, h) { (x, y) =>
      (pattern(x, y), (x * 5 + y) % 256, (255 - pattern(y % 28, x % 40)))
    }
    val bytes = encode(img, 0.85f)
    val mine = JpegDecodeImpl.jpegLuma(bytes)
    assert(mine != null && mine.length == w * h)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val (r, g, b) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
      val refY = (77 * r + 150 * g + 29 * b + 128) >> 8
      sumDiff += math.abs((mine(y * w + x) & 0xFF) - refY)
    }
    // chroma subsampling + RGB round trip adds noise; the Y plane must
    // still track the reference luma closely on average
    assert(sumDiff.toDouble / (w * h) <= 3.0,
      s"mean luma diff ${sumDiff.toDouble / (w * h)}")
  }

  test("re-encoded JPEG lands near in decoded-hash space, far in byte space") {
    val img = grayImage(80, 60)(pattern)
    val a = encode(img, 0.92f)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    def decoded(x: Array[Byte]) = PngDecodeImpl.dhashDecoded63(x)
    // a gentle re-encode (the CDN/proxy case) stays inside the default
    // banding distance; a HEAVY one (q 0.6 guts the high-frequency
    // texture) drifts further but remains far under the ~31 bits two
    // unrelated images average — distance degrades with quantization
    // loss instead of cliffing, which is the point of hashing pixels
    // measured on this fixture: gentle 6, heavy 8 — the textured
    // pattern has thin adjacent-strip margins, so a few comparisons
    // sit near ties (the smoother index-test fixture below lands ≤ 3);
    // both stay FAR under the ~31-bit unrelated-image average
    val gentle = ham(decoded(a), decoded(encode(img, 0.85f)))
    val heavy = ham(decoded(a), decoded(encode(img, 0.6f)))
    assert(gentle <= 8, s"gentle re-encode hamming $gentle")
    assert(heavy <= 16, s"heavy re-encode hamming $heavy")
    val byteDist = ham(PerceptualHashImpl.dhash63(a),
      PerceptualHashImpl.dhash63(encode(img, 0.85f)))
    assert(byteDist > gentle,
      s"byte-path ($byteDist) should lose to decoded-path ($gentle)")
    // a genuinely different image stays far on the decoded path
    val other = encode(grayImage(80, 60)((x, y) => pattern(79 - x, 59 - y)), 0.9f)
    assert(ham(decoded(a), decoded(other)) > 10)
  }

  test("fallback scope: progressive, truncation, garbage, hostile dims -> null") {
    val img = grayImage(40, 28)(pattern)
    val good = encode(img, 0.9f)
    assert(JpegDecodeImpl.jpegLuma(good) != null)
    // progressive (SOF2) is out of scope -> null, bytes-as-luma fallback
    val prog = encode(img, 0.9f, progressive = true)
    assert(JpegDecodeImpl.jpegLuma(prog) == null)
    assert(PngDecodeImpl.dhashDecoded63(prog) == PerceptualHashImpl.dhash63(prog))
    // truncations at every stage: header, tables, mid-entropy
    for (cut <- Seq(2, 4, 20, good.length / 2, good.length - 4))
      assert(JpegDecodeImpl.jpegLuma(good.take(cut)) == null, s"cut $cut")
    assert(JpegDecodeImpl.jpegLuma(Array.empty[Byte]) == null)
    assert(JpegDecodeImpl.jpegLuma("not a jpeg at all".getBytes("UTF-8")) == null)
    // hostile SOF dims: splice 60000 x 60000 into the real header
    val sofAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 4 < good.length) {
        if ((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0) at = i
        else i += 1
      }
      at
    }
    assert(sofAt > 0, "SOF0 not found in reference encoder output")
    val evil = good.clone()
    evil(sofAt + 5) = 0xEA.toByte; evil(sofAt + 6) = 0x60.toByte // h = 60000
    evil(sofAt + 7) = 0xEA.toByte; evil(sofAt + 8) = 0x60.toByte // w = 60000
    assert(JpegDecodeImpl.jpegLuma(evil) == null,
      "pixel-product cap must reject (3.6e9 pixels > 2^24)")
  }

  test("restart markers: DC predictors reset per interval (hand-built DRI stream)") {
    // ImageIO never emits DRI, so this fixture is built byte-by-byte:
    // 16x16 grayscale, 4 MCUs, DRI=2, minimal custom Huffman tables
    // (DC: 00 -> cat 0, 01 -> cat 4; AC: 00 -> EOB), quant table all
    // 16s. Blocks encode DC diffs (+8, 0, RST0, +8, 0): WITH the reset
    // every block's DC value is 8 -> every pixel 8*16/8 + 128 = 144;
    // a decoder that forgot the reset would read 16/16 for the second
    // interval (pixels 160).
    def seg(tag: Int, body: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, tag.toByte,
        (((body.length + 2) >> 8) & 0xFF).toByte,
        ((body.length + 2) & 0xFF).toByte) ++ body
    val dqt = seg(0xDB, Array(0x00.toByte) ++ Array.fill(64)(16.toByte))
    val sof = seg(0xC0, Array[Byte](8, 0, 16, 0, 16, 1, 1, 0x11, 0))
    val dhtDc = seg(0xC4, Array[Byte](0x00, 0, 2) ++ Array.fill(14)(0.toByte)
      ++ Array[Byte](0, 4))
    val dhtAc = seg(0xC4, Array[Byte](0x10, 0, 1) ++ Array.fill(14)(0.toByte)
      ++ Array[Byte](0))
    val dri = seg(0xDD, Array[Byte](0, 2))
    val sos = seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // interval = block(+8): 01 1000, block(0): 00, EOB 00 each ->
    // bits 01 1000 00 | 00 00 + pad 1111 -> 0x60 0x0F
    val interval = Array(0x60.toByte, 0x0F.toByte)
    val jpeg = Array(0xFF.toByte, 0xD8.toByte) ++ dqt ++ sof ++ dhtDc ++
      dhtAc ++ dri ++ sos ++ interval ++
      Array(0xFF.toByte, 0xD0.toByte) ++ interval ++
      Array(0xFF.toByte, 0xD9.toByte)
    val luma = JpegDecodeImpl.jpegLuma(jpeg)
    assert(luma != null, "hand-built DRI stream must decode")
    assert(luma.length == 256)
    assert(luma.forall(b => (b & 0xFF) == 144),
      s"DC predictor reset failed: distinct values " +
        luma.map(_ & 0xFF).distinct.mkString(","))
  }

  test("lying DQT length: table bytes past the declared segment end -> null") {
    // a DQT claiming Pq=0 (64-byte table) inside a segment whose declared
    // length holds only 32 table bytes — the remaining 32 bytes it would
    // read belong to the NEXT segment. The explicit pre-check
    // (p + tableLen <= end, mirroring the DHT path) must reject it
    // outright, never splice SOF header bytes into a quant table.
    def seg(tag: Int, body: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, tag.toByte,
        (((body.length + 2) >> 8) & 0xFF).toByte,
        ((body.length + 2) & 0xFF).toByte) ++ body
    val dqtLying = seg(0xDB, Array(0x00.toByte) ++ Array.fill(32)(16.toByte))
    val sof = seg(0xC0, Array[Byte](8, 0, 16, 0, 16, 1, 1, 0x11, 0))
    val dhtDc = seg(0xC4, Array[Byte](0x00, 0, 2) ++ Array.fill(14)(0.toByte)
      ++ Array[Byte](0, 4))
    val dhtAc = seg(0xC4, Array[Byte](0x10, 0, 1) ++ Array.fill(14)(0.toByte)
      ++ Array[Byte](0))
    val dri = seg(0xDD, Array[Byte](0, 2))
    val sos = seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // entropy data for the 4 MCUs of a 16x16 single-component image,
    // exactly the DRI test's stream: two 2-block intervals around RST0
    val interval = Array(0x60.toByte, 0x0F.toByte)
    def stream(dqt: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, 0xD8.toByte) ++ dqt ++ sof ++ dhtDc ++
        dhtAc ++ dri ++ sos ++ interval ++
        Array(0xFF.toByte, 0xD0.toByte) ++ interval ++
        Array(0xFF.toByte, 0xD9.toByte)
    assert(JpegDecodeImpl.jpegLuma(stream(dqtLying)) == null,
      "lying DQT length must reject, not read into the next segment")
    // the same stream with an honest 64-byte table decodes (control arm:
    // proves the rejection above is the LENGTH check, not a broken fixture)
    val dqtHonest = seg(0xDB, Array(0x00.toByte) ++ Array.fill(64)(16.toByte))
    assert(JpegDecodeImpl.jpegLuma(stream(dqtHonest)) != null,
      "control stream must decode")
  }

  test("ops: a JPEG re-encode surfaces against the phash index like a PNG would") {
    val path = graft.Paths.scratchDir("graft-jpeg-idx").resolve("idx").toString
    val corpus = (0 until 8).map { k =>
      (k.toLong, encode(grayImage(64, 48)((x, y) =>
        (pattern(x, y) + 17 * k) % 256), 0.9f))
    }.toDF("doc_id", "content")
    Dedup.writePhashIndex(corpus, "doc_id", "content", path)
    val batch = Seq(
      (100L, encode(grayImage(64, 48)((x, y) => (pattern(x, y) + 17 * 3) % 256), 0.55f)),
      (200L, encode(grayImage(64, 48)((x, y) => 255 - pattern(x, y)), 0.9f)))
      .toDF("doc_id", "content")
    val hits = Dedup.probePhashIndex(spark, path, batch, "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((100L, 3L)), s"re-encode must match its original: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 200L), "an inverted image must not match")
  }
}
