package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AVI container-walk specs. The frame payloads come from the JDK's
  * own ImageIO JPEG encoder (the established independent reference
  * codec — [[JpegDecodeSpec]]), so the "re-encoded AVI matches its
  * original" assertion exercises REAL pixel decode end to end: AVI
  * walk → JPEG frame bytes → [[JpegDecodeImpl]] luma → dHash. The
  * byte-stride arm is pinned bit-for-bit against the previous
  * declarative `substr` + `dhashDecoded` form on random payloads. */
class AviDecodeSpec extends SparkSpec {

  import spark.implicits._

  // --- RIFF/AVI builder (little-endian sizes, word-aligned chunks) ---

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    tag.getBytes("US-ASCII") ++ u32le(body.length) ++ body ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ body)

  private def avi(moviBody: Array[Byte], extraTop: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", "avih".getBytes("US-ASCII") ++ u32le(4) ++ u32le(40000)) ++
      extraTop ++ list("movi", moviBody)
    "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
  }

  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] =
    avi(frames.map(chunk("00dc", _)).fold(Array.emptyByteArray)(_ ++ _))

  // --- JPEG frame fixtures (smooth gradients: measured dHash bands) ---

  private def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), p)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  private def grayImage(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y) & 0xFF)
    img
  }

  /** Smooth per-frame gradient scene k (re-encode hamming ≤ 3 band). */
  private def scene(k: Int): BufferedImage =
    grayImage(64, 48)((x, y) => (x * 3 + y * 2 + k * 29) % 256)

  /** Structurally distinct clip: descending ramp (the ScaleProbe
    * novel-fixture lesson — min distance 53 from gradient scenes). */
  private def ramp(k: Int): BufferedImage =
    grayImage(64, 48)((x, y) => 255 - ((x * 5 + y + k * 13) % 256))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aviFrames: movi walk finds stream-0 video chunks in order, skips audio/rec nesting") {
    val f0 = Array.tabulate(9)(i => (i * 7).toByte) // odd size → padded
    val f1 = Array.emptyByteArray // dropped-frame placeholder IS a frame
    val f2 = Array.tabulate(16)(i => (200 - i).toByte)
    val f3 = Array.tabulate(5)(i => (i + 90).toByte)
    val movi = chunk("00dc", f0) ++ chunk("01wb", Array.fill(8)(1.toByte)) ++
      chunk("00dc", f1) ++ list("rec ",
        chunk("00db", f2) ++ chunk("01wb", Array.fill(4)(2.toByte))) ++
      chunk("00dc", f3)
    val frames = AviDecodeImpl.aviFrames(avi(movi))
    assert(frames != null && frames.length == 4)
    assert(frames(0).toSeq == f0.toSeq)
    assert(frames(1).isEmpty)
    assert(frames(2).toSeq == f2.toSeq)
    assert(frames(3).toSeq == f3.toSeq)
  }

  test("aviFrames: non-AVI, no-movi, lying sizes and rec-in-rec all yield null (byte fallback)") {
    assert(AviDecodeImpl.aviFrames("plain text".getBytes) == null)
    assert(AviDecodeImpl.aviFrames(Array.emptyByteArray) == null)
    // RIFF/WAVE (a WAV) is not an AVI
    val wav = "RIFF".getBytes ++ u32le(4) ++ "WAVE".getBytes
    assert(AviDecodeImpl.aviFrames(wav) == null)
    // an EMPTY movi list is still an AVI: zero frames, not a fallback
    val emptyMovi = AviDecodeImpl.aviFrames(avi(Array.emptyByteArray))
    assert(emptyMovi != null && emptyMovi.length == 0)
    // RIFF/AVI magic but no movi list at all → byte fallback
    val noMovi = "RIFF".getBytes ++ u32le(4) ++ "AVI ".getBytes
    assert(AviDecodeImpl.aviFrames(noMovi) == null)
    // a lying chunk size inside movi
    val lying = avi(chunk("00dc", Array.fill(4)(1.toByte))
      .patch(4, u32le(1000000), 4))
    assert(AviDecodeImpl.aviFrames(lying) == null)
    // rec-in-rec nesting is out of scope
    val nested = avi(list("rec ", list("rec ", chunk("00dc", Array.fill(2)(3.toByte)))))
    assert(AviDecodeImpl.aviFrames(nested) == null)
    // truncated mid-header must not throw
    val good = mjpegAvi(Seq(encode(scene(1), 0.9f)))
    assert(AviDecodeImpl.aviFrames(good.take(20)) == null)
  }

  test("videoFrameHashes AVI arm: container frames through real JPEG decode, stride honored") {
    val jf = (0 until 5).map(k => encode(scene(k), 0.9f))
    val payload = mjpegAvi(jf)
    val df = Seq((1L, payload)).toDF("doc_id", "content")
    val got = graft.ops.Multimodal.videoFrameHashes(df, frameBytes = 256, stride = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // sampled frames 0,2,4 — hashes are dhashDecoded63 of the REAL frame bytes
    assert(got.keySet == Set(0, 2, 4))
    for (k <- Seq(0, 2, 4))
      assert(got(k) == PngDecodeImpl.dhashDecoded63(jf(k)), s"frame $k")
    // and the decode arm is live: decoded hash differs from bytes-as-luma
    assert(got(0) != PerceptualHashImpl.dhash63(jf(0)))
  }

  test("videoNearDupPairs: re-encoded MJPEG AVI matches its original; distinct clip does not") {
    val scenes = (0 until 6).map(scene)
    val orig = mjpegAvi(scenes.map(encode(_, 0.92f)))
    val reenc = mjpegAvi(scenes.map(encode(_, 0.85f))) // re-encoded copy
    val other = mjpegAvi((0 until 6).map(k => encode(ramp(k), 0.9f)))
    // measured re-encode band on these smooth scenes (assert the band,
    // then let the pipeline vote over it)
    val dists = scenes.indices.map { k =>
      ham(PngDecodeImpl.dhashDecoded63(encode(scenes(k), 0.92f)),
        PngDecodeImpl.dhashDecoded63(encode(scenes(k), 0.85f)))
    }
    assert(dists.forall(_ <= 6), s"re-encode hamming out of band: $dists")
    val df = Seq((1L, orig), (2L, reenc), (3L, other)).toDF("doc_id", "content")
    val pairs = graft.ops.Multimodal.videoNearDupPairs(df, "doc_id", "content",
        frameBytes = 256, stride = 1, maxDistance = 6, minMatched = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), s"${pairs.toSeq}")
    assert(pairs.head._3 >= 4L && pairs.head._3 <= 6L)
  }

  test("byte-stride arm: kernel is bit-for-bit the declarative substr + dhashDecoded form") {
    val rnd = new scala.util.Random(421)
    val payloads = (1L to 24L).map { id =>
      val n = rnd.nextInt(1200) // includes 0 (empty payload → no frames)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      (id, b)
    }
    val df = payloads.toDF("doc_id", "content")
    for ((fb, st) <- Seq((256, 4), (64, 1), (100, 3))) {
      val kernel = graft.ops.Multimodal.videoFrameHashes(df, frameBytes = fb, stride = st)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      // the pre-kernel declarative form, verbatim
      val nFrames = ceil(length(col("content")).cast("double") / fb).cast("int")
      val frameIdx = when(nFrames > 0,
        filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(st)) === 0))
        .otherwise(array().cast("array<int>"))
      val oracle = df.select(col("doc_id"), col("content"), explode(frameIdx).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          PngDecode.dhashDecoded(col("content")
            .substr(col("frame_idx") * fb + 1, lit(fb))).as("fh"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(kernel == oracle, s"frameBytes=$fb stride=$st")
    }
    // null payload propagates to zero rows
    val withNull = Seq((9L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    assert(graft.ops.Multimodal.videoFrameHashes(withNull).count() == 0L)
  }

  test("frame-walk cap: more than MaxFrames video chunks truncate at the cap") {
    val one = Array(42.toByte, 7.toByte)
    val movi = (0 until AviDecodeImpl.MaxFrames + 10)
      .map(_ => chunk("00dc", one)).fold(Array.emptyByteArray)(_ ++ _)
    val frames = AviDecodeImpl.aviFrames(avi(movi))
    assert(frames != null && frames.length == AviDecodeImpl.MaxFrames)
  }
}
