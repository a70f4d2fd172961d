package graft.functions

import graft.SparkSpec
import graft.ops.Audio
import org.apache.spark.sql.functions._

/** WAV decode + audio fingerprint specs. The writer below is an
  * independent RIFF/PCM encoder (little-endian fields, word-aligned
  * chunks) so the decoder is only ever tested against what the format
  * defines, not against its own output.
  */
class WavDecodeSpec extends SparkSpec {

  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++ pad
  }

  private def fmtChunk(rate: Int, channels: Int, bits: Int,
      audioFormat: Int = 1): Array[Byte] = {
    val blockAlign = channels * bits / 8
    chunk("fmt ", le16(audioFormat) ++ le16(channels) ++ le32(rate.toLong) ++
      le32(rate.toLong * blockAlign) ++ le16(blockAlign) ++ le16(bits))
  }

  private def dataChunk(interleaved: Array[Int], bits: Int): Array[Byte] = {
    val body =
      if (bits == 16) interleaved.flatMap(s => le16(s & 0xFFFF))
      else interleaved.map(s => ((s + 128) & 0xFF).toByte)
    chunk("data", body)
  }

  /** Assembles RIFF/WAVE from pre-built chunks. */
  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WAVE".getBytes("US-ASCII") ++ chunks.flatten
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  private def wav(rate: Int, channels: Int, bits: Int,
      interleaved: Array[Int]): Array[Byte] =
    riff(fmtChunk(rate, channels, bits), dataChunk(interleaved, bits))

  private val tone = Array.tabulate(480)(i => ((i * 37) % 1601) - 800)

  test("16-bit mono round trip: samples, meta, features") {
    val b = wav(8000, 1, 16, tone)
    assert(WavDecodeImpl.monoSamples(b).toSeq == tone.map(_.toLong).toSeq)
    val st = WavDecodeImpl.wavStats(b, 0L).toLongArray()
    val abs = tone.map(s => math.abs(s).toLong)
    assert(st.toSeq == Seq[Long](8000, 1, 16, 480, 480L * 1000 / 8000,
      abs.sum / 480, abs.max, 0, 0))
  }

  test("8-bit samples are unsigned, rebased to signed") {
    val s = Array(-128, -1, 0, 1, 127, 64, -64, 3)
    val b = wav(4000, 1, 8, s)
    assert(WavDecodeImpl.monoSamples(b).toSeq == s.map(_.toLong).toSeq)
  }

  test("stereo mixes to mono with TRUNCATING division (negative sums too)") {
    // frames: (-3,-4) -> -7/2 = -3 (trunc, the DuckDB-`//`-portable
    // choice — flooring would say -4), (5,6) -> 5, (0,-1) -> 0
    val b = wav(8000, 2, 16, Array(-3, -4, 5, 6, 0, -1))
    assert(WavDecodeImpl.monoSamples(b).toSeq == Seq(-3L, 5L, 0L))
  }

  test("chunk walk: LIST before fmt, data before fmt, odd-size padding") {
    val noise = chunk("LIST", Array.tabulate(7)(_.toByte)) // odd -> padded
    val d = dataChunk(tone, 16)
    val f = fmtChunk(8000, 1, 16)
    for (b <- Seq(riff(noise, f, d), riff(d, f), riff(f, noise, d)))
      assert(WavDecodeImpl.monoSamples(b).toSeq == tone.map(_.toLong).toSeq)
  }

  test("first data chunk wins") {
    val b = riff(fmtChunk(8000, 1, 16),
      dataChunk(Array(7, 8), 16), dataChunk(Array(1, 2, 3), 16))
    assert(WavDecodeImpl.monoSamples(b).toSeq == Seq(7L, 8L))
  }

  test("rejections yield null, never throw") {
    val good = wav(8000, 1, 16, tone)
    val cases = Seq[Array[Byte]](
      Array.empty,
      "RIFX".getBytes ++ good.drop(4), // bad magic
      good.take(20), // truncated mid-chunk
      riff(fmtChunk(8000, 1, 16, audioFormat = 3), dataChunk(tone, 16)), // float PCM
      riff(fmtChunk(8000, 1, 24), dataChunk(tone, 16)), // unsupported depth
      riff(fmtChunk(0, 1, 16), dataChunk(tone, 16)), // zero rate
      riff(fmtChunk(8000, 0, 16), dataChunk(tone, 16)), // zero channels
      riff(fmtChunk(8000, 65, 16), dataChunk(tone, 16)), // over channel cap
      riff(fmtChunk(8000, 1, 16)), // no data chunk
      riff(dataChunk(tone, 16)), // no fmt chunk
      // ragged data: 3 bytes is not a whole 16-bit frame
      riff(fmtChunk(8000, 1, 16), chunk("data", Array[Byte](1, 2, 3))),
      // declared chunk size runs past the real buffer
      riff(fmtChunk(8000, 1, 16),
        "data".getBytes("US-ASCII") ++ le32(9999L) ++ Array[Byte](0, 0)))
    for (b <- cases) {
      assert(WavDecodeImpl.monoSamples(b) == null)
      assert(WavDecodeImpl.wavStats(b, 0L) == null)
      // fingerprint falls back to bytes-as-samples instead
      assert(WavDecodeImpl.afpWav63(b) ==
        PerceptualHashImpl.dhash63(b))
    }
  }

  test("afp63 is EXACTLY invariant under integer DC offset") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(900)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toLong)
      val c = rnd.nextInt(2001) - 1000
      val shifted = s.map(_ + c)
      assert(WavDecodeImpl.afp63(shifted) == WavDecodeImpl.afp63(s),
        s"trial $trial n=$n c=$c")
    }
  }

  test("bytes-as-samples fallback coincides bit-for-bit with dhash63") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 30) {
      val b = Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(256).toByte)
      assert(WavDecodeImpl.afpWav63(b) == PerceptualHashImpl.dhash63(b))
    }
  }

  test("silence counting: leading, trailing, and fully-silent signals") {
    val s = Array(0, 0, 2, -9, 300, -2, 0, 0, 0)
    val st = WavDecodeImpl.wavStats(wav(8000, 1, 16, s), 2L).toLongArray()
    assert(st(7) == 3 && st(8) == 4) // |2| <= 2 leads; |-2|,0,0,0 trail
    val silent = WavDecodeImpl.wavStats(
      wav(8000, 1, 16, Array.fill(5)(0)), 0L).toLongArray()
    assert(silent(7) == 5 && silent(8) == 0) // counted once, lead wins
  }

  test("Column surface: null payload propagates, non-WAV stats null") {
    val df = Seq(
      (1L, wav(8000, 1, 16, tone)),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    val out = Audio.audioStatColumns(df).orderBy("doc_id")
      .select("doc_id", "sample_rate", "n_samples").collect()
    assert(out(0).getLong(1) == 8000 && out(0).getLong(2) == 480)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    val fp = df.orderBy("doc_id")
      .select(Audio.audioFingerprint(col("content"))).collect()
    assert(fp(0).getLong(0) == WavDecodeImpl.afp63(tone.map(_.toLong)))
    assert(fp(1).getLong(0) ==
      PerceptualHashImpl.dhash63("not audio".getBytes("UTF-8")))
    assert(fp(2).isNullAt(0))
  }

  test("SQL surface parity: graft_audio_* plan the identical kernels") {
    SqlKernels.registerAll(spark)
    val df = Seq((1L, wav(8000, 1, 16, tone)),
      (2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "content")
    df.createOrReplaceTempView("wav_parity")
    val sqlOut = spark.sql(
      """SELECT doc_id, graft_audio_stats(content, 2) AS st,
        |  graft_audio_fingerprint(content) AS fp
        |FROM wav_parity ORDER BY doc_id""".stripMargin).collect()
    val colOut = df.select(col("doc_id"),
      WavDecode.stats(col("content"), lit(2)).as("st"),
      Audio.audioFingerprint(col("content")).as("fp"))
      .orderBy("doc_id").collect()
    assert(sqlOut.toSeq == colOut.toSeq)
  }

  test("ops: fingerprint index round trip — re-records match, novel audio does not") {
    val path = graft.Paths.scratchDir("graft-afp-idx").resolve("idx").toString
    val corpus = (0 until 30).map { c =>
      (c.toLong, wav(8000, 1, 16,
        Array.tabulate(450)(i => (((c + 3) * (i * i + 7 * i)) % 1601) - 800)))
    }.toDF("doc_id", "content")
    Audio.writeFingerprintIndex(corpus, "doc_id", path)
    val batch = (0 until 10).map { c => // DC +40 re-records of cores 0..9
      (100L + c, wav(8000, 1, 16,
        Array.tabulate(450)(i => (((c + 3) * (i * i + 7 * i)) % 1601) - 760)))
    }.toDF("doc_id", "content")
      .unionByName(Seq((200L, wav(8000, 1, 16,
        Array.tabulate(450)(i => 800 - (((7 * i) * i) % 1600))))) // novel shape
        .toDF("doc_id", "content"))
    val hits = Audio.probeFingerprintIndex(spark, path, batch, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every re-record matches exactly its core at hamming 0 (DC exact)
    assert(hits.filter(_._1 < 200L).toSet ==
      (0 until 10).map(c => (100L + c, c.toLong, 0)).toSet)
    assert(!hits.exists(_._1 == 200L), "novel audio must not match")
  }

  test("hash-kind guard: audio and image signature spaces never cross-probe") {
    val path = graft.Paths.scratchDir("graft-kind-idx").resolve("idx").toString
    val corpus = Seq((1L, wav(8000, 1, 16, tone))).toDF("doc_id", "content")
    Audio.writeFingerprintIndex(corpus, "doc_id", path)
    // the image probe hashes dhash2 — probing an afp1 index must raise,
    // not silently return zero matches
    val e = intercept[Exception] {
      graft.ops.Dedup.probePhashIndex(spark, path, corpus, "doc_id", "content")
        .collect()
    }
    assert(e.getMessage.contains("hash kinds"), e.getMessage)
    // appending across kinds raises the same way
    val e2 = intercept[Exception] {
      graft.ops.Dedup.appendToPhashIndex(corpus, "doc_id", "content", path)
    }
    assert(e2.getMessage.contains("hash kinds"), e2.getMessage)
    // the matching probe still works
    assert(Audio.probeFingerprintIndex(spark, path, corpus, "doc_id")
      .count() == 1L)
  }

  test("ops: DC-offset re-record pairs up, different waveform does not") {
    val copy = tone.map(_ + 25)
    val other = Array.tabulate(480)(i => ((i * i * 13) % 1601) - 800)
    val df = Seq((1L, wav(8000, 1, 16, tone)), (2L, wav(8000, 1, 16, copy)),
      (3L, wav(8000, 1, 16, other))).toDF("doc_id", "content")
    val pairs = Audio.audioNearDupPairs(df, "doc_id")
      .select("id_a", "id_b", "hamming").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 0)))
  }
}
