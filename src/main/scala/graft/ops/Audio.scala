package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{WavDecode, WavDecodeImpl}

/** Audio operators for the multimodal tier — the training-data
  * pipeline's audio leg, built on the zero-dep PCM WAV decode
  * ([[graft.functions.WavDecodeImpl]]): typed metadata, loudness /
  * silence features, and a perceptual fingerprint that rides the SAME
  * banding + persisted-index machinery as the image tier
  * ([[Dedup.simhashPairs]], `Dedup.writePhashIndex` and friends — the
  * fingerprint is just another 64-bit signature column).
  *
  * Scale notes: every operator here is one fused codegen kernel per
  * row (decode + feature in a single call frame — the sample buffer is
  * never a column, never shuffled); non-WAV or corrupt payloads yield
  * null stats (filterable, never fatal), so a mixed 100 TB media
  * corpus runs these unguarded. The reference stringifies blobs
  * (`filesql.go:649-707`) — this tier is extension-only.
  */
object Audio {

  /** Decoded PCM metadata + loudness/silence features as typed
    * columns: `sample_rate`, `channels`, `bits`, `n_samples`,
    * `duration_ms`, `mean_abs`, `peak_abs`, `lead_silence`,
    * `trail_silence` (all BIGINT; all null for non-WAV payloads). A
    * sample is silent iff |s| ≤ `silenceAbsMax`. ONE decode per row:
    * the stat vector is bound through a 1-element transform before
    * the 9 unpacks ([[Dedup.bindOnce]] — Catalyst does not CSE across
    * projection items, the round-2/round-8 HOF rule). */
  def audioStatColumns(df: DataFrame, payloadCol: String = "content",
      silenceAbsMax: Long = 0L): DataFrame = {
    val bound =
      Dedup.bindOnce(WavDecode.stats(col(payloadCol), lit(silenceAbsMax))) {
        st => struct(WavDecodeImpl.StatNames.zipWithIndex.map {
          case (n, i) => element_at(st, i + 1).as(n)
        }: _*)
      }
    val withS = df.withColumn("__astats", bound)
    WavDecodeImpl.StatNames.foldLeft(withS) { (d, n) =>
      d.withColumn(n, col("__astats").getField(n))
    }.drop("__astats")
  }

  /** 63-bit perceptual audio fingerprint column (decoded mono samples
    * through the dHash construction; exact under integer DC offset —
    * [[graft.functions.WavDecodeImpl.afp63]]). Non-WAV payloads hash
    * bytes-as-samples, which coincides bit-for-bit with the image
    * tier's `dhash63`, so mixed-media frames share one signature
    * vocabulary. */
  def audioFingerprint(payload: Column): Column = WavDecode.fingerprint(payload)

  /** Persist an audio-fingerprint membership index — the
    * [[Dedup.writePhashIndex]] lifecycle (narrow (id, ph) rows +
    * `_meta` banding sidecar, atomic swap, memoized distance) with the
    * AUDIO kernel supplying signatures: a continuously-ingesting audio
    * corpus is fingerprinted once, and each incoming batch joins
    * 16-byte signature rows — the waveform bytes are never re-read. */
  def writeFingerprintIndex(corpus: DataFrame, idCol: String,
      path: String, payloadCol: String = "content",
      maxDistance: Int = 3): Unit =
    Dedup.writePhashSignatures(
      corpus.select(col(idCol).as("id"),
        audioFingerprint(col(payloadCol)).as("ph")), path, maxDistance,
      AfpHashKind)

  /** Hash-space tag of the audio fingerprint kernel — persisted in the
    * index `_meta` and checked by probes/appends, so an audio index
    * can never be silently probed with image signatures (or vice
    * versa): same 64-bit vocabulary, disjoint hash spaces. */
  val AfpHashKind: String = "afp1"

  /** Probe an audio batch against a [[writeFingerprintIndex]] index:
    * (batch_id, index_id, hamming) for every batch item within the
    * index's banding distance — re-recorded (DC-shifted, lightly
    * clipped) copies of indexed audio surface here where exact digests
    * miss them. Same banding/prune machinery as the image probe. */
  def probeFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String,
      payloadCol: String = "content", maxBucket: Int = 1000): DataFrame =
    Dedup.probePhashSignatures(spark, path,
      Lineage.cut(batch.select(col(idCol).as("id"),
        audioFingerprint(col(payloadCol)).as("ph"))), AfpHashKind, maxBucket)

  /** Near-dup pairs among audio payloads: fingerprint + the pigeonhole
    * band pairer (maxDistance+1 chunks — any ≤maxDistance pair shares
    * an exact chunk, no-miss; `maxBucket` is the documented skew cap).
    * Emits (id_a, id_b, hamming). */
  def audioNearDupPairs(df: DataFrame, idCol: String,
      payloadCol: String = "content", maxDistance: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol),
      audioFingerprint(col(payloadCol)).as("__afp"))
    Dedup.simhashPairs(sigs, idCol, "__afp", maxDistance, maxBucket)
  }
}
