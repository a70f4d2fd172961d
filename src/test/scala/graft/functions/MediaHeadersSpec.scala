package graft.functions

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Crafted-fixture specs for the PNG IHDR / JPEG SOF header kernel:
  * every byte sequence below is hand-assembled to the container specs,
  * including the corruption cases a 100 TB corpus will contain. */
class MediaHeadersSpec extends SparkSpec {

  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Minimal structurally-valid PNG: signature + IHDR(w, h). */
  private def png(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',                  // IHDR len + tag
      w >> 24, w >> 16, w >> 8, w, h >> 24, h >> 16, h >> 8, h,
      8, 2, 0, 0, 0,                                    // depth/color/comp/filter/interlace
      0xDE, 0xAD, 0xBE, 0xEF)                           // CRC (not checked)

  /** JPEG: SOI + given segments + EOI. */
  private def jpeg(segments: Array[Byte]*): Array[Byte] =
    bytes(0xFF, 0xD8) ++ segments.flatten ++ bytes(0xFF, 0xD9)

  private def app0: Array[Byte] =
    bytes(0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0)

  private def sof(marker: Int, w: Int, h: Int): Array[Byte] =
    bytes(0xFF, marker, 0x00, 0x11, 8, h >> 8, h, w >> 8, w,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)

  private def com(n: Int): Array[Byte] =
    bytes(0xFF, 0xFE, (n + 2) >> 8, n + 2) ++ Array.fill(n)('x'.toByte)

  /** A DHT table segment — 0xC4 sits in the SOF marker range but is NOT
    * a frame header; the walk must skip it. */
  private def dht: Array[Byte] =
    bytes(0xFF, 0xC4, 0x00, 0x05, 0, 1, 2)

  test("PNG IHDR: dimensions from fixed offsets; corrupt variants degrade to -1") {
    assert(MediaHeadersImpl.formatName(png(640, 480)) == "png")
    assert(MediaHeadersImpl.widthOf(png(640, 480)) == 640)
    assert(MediaHeadersImpl.heightOf(png(640, 480)) == 480)
    assert(MediaHeadersImpl.widthOf(png(1, 1)) == 1)
    assert(MediaHeadersImpl.widthOf(png(65535, 3)) == 65535)
    // signature but truncated before the IHDR dims
    val truncated = png(9, 9).take(14)
    assert(MediaHeadersImpl.formatName(truncated) == "png")
    assert(MediaHeadersImpl.widthOf(truncated) == -1)
    // signature but first chunk is not IHDR
    val wrongChunk = png(9, 9)
    wrongChunk(12) = 'X'.toByte
    assert(MediaHeadersImpl.widthOf(wrongChunk) == -1)
    // zero / high-bit dims are corruption, not sizes
    assert(MediaHeadersImpl.widthOf(png(0, 10)) == -1)
    val huge = png(1, 1)
    huge(16) = 0x80.toByte // width bit 31 set
    assert(MediaHeadersImpl.widthOf(huge) == -1)
  }

  test("JPEG SOF: marker walk across APP0/COM/DHT, SOF0 and SOF2, corruption cases") {
    val plain = jpeg(app0, sof(0xC0, 1024, 768))
    assert(MediaHeadersImpl.formatName(plain) == "jpeg")
    assert(MediaHeadersImpl.widthOf(plain) == 1024)
    assert(MediaHeadersImpl.heightOf(plain) == 768)
    // progressive (SOF2) behind a COM segment: the walk must hop the
    // variable-length comment, not read a fixed offset
    val progressive = jpeg(app0, com(23), sof(0xC2, 800, 600))
    assert(MediaHeadersImpl.widthOf(progressive) == 800)
    assert(MediaHeadersImpl.heightOf(progressive) == 600)
    // DHT (0xC4) is in the Cx range but carries tables, not dimensions
    val withDht = jpeg(app0, dht, sof(0xC1, 320, 200))
    assert(MediaHeadersImpl.widthOf(withDht) == 320)
    // SOS before any SOF: give up cleanly
    val noSof = jpeg(app0, bytes(0xFF, 0xDA, 0x00, 0x02))
    assert(MediaHeadersImpl.formatName(noSof) == "jpeg")
    assert(MediaHeadersImpl.widthOf(noSof) == -1)
    // truncated mid-segment
    assert(MediaHeadersImpl.widthOf(plain.take(10)) == -1)
    // lost marker sync INSIDE the walk: corrupt the SOF's 0xFF (byte 20,
    // just after the 18-byte APP0) so the signature stays valid and the
    // walk itself hits the non-FF byte
    val desync = jpeg(app0, sof(0xC0, 10, 10))
    desync(20) = 0x00.toByte
    assert(MediaHeadersImpl.formatName(desync) == "jpeg")
    assert(MediaHeadersImpl.widthOf(desync) == -1)
  }

  test("unknown payloads and the Column surface") {
    assert(MediaHeadersImpl.formatName(Array.emptyByteArray) == "unknown")
    assert(MediaHeadersImpl.formatName("just text".getBytes("UTF-8")) == "unknown")
    assert(MediaHeadersImpl.widthOf("just text".getBytes("UTF-8")) == -1)
    val rows = Seq(
      (1L, png(640, 480)), (2L, jpeg(app0, com(5), sof(0xC2, 12, 34))),
      (3L, "plain".getBytes("UTF-8")), (4L, null)
    ).toDF("id", "content")
    val out = Multimodal.mediaMetaColumns(rows)
      .select("id", "format", "width", "height")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) -999 else r.getInt(2),
          if (r.isNullAt(3)) -999 else r.getInt(3))).toMap
    assert(out(1L) == (("png", 640, 480)))
    assert(out(2L) == (("jpeg", 12, 34)))
    assert(out(3L) == (("unknown", -1, -1)))
    assert(out(4L) == ((null, -999, -999))) // null payload propagates null
  }

  test("decodeMeta: real headers win, non-media payloads keep the stub fallback") {
    val rows = Seq((1L, png(111, 222)), (2L, "not media".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val meta = Multimodal.decodeMeta(rows).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 111 &&
      meta(1L).height == 222 && meta(1L).ok)
    // fallback = the documented deterministic stub
    val stub = Multimodal.stubDecode(2L, "not media".getBytes("UTF-8"))
    assert(meta(2L) == stub)
  }
}
