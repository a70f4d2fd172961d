package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * batch decode / feature-extract / frame-sample operators.
  *
  * The Spark-side shape is real and tested: schema, partitioning, batch
  * iteration (`mapPartitions` over an iterator — the JVM analog of a
  * `mapInPandas` batch loop), deterministic outputs. Header-level
  * metadata (container format, pixel dimensions) is REAL: PNG IHDR and
  * JPEG SOF parsing is pure byte arithmetic, done by the
  * [[graft.functions.MediaHeaders]] codegen kernel. Only full-content
  * decoding (pixel data, audio samples) is STUBBED — no media libraries
  * in this container: [[Multimodal.stubDecode]] derives deterministic
  * fake dimensions from the payload hash for payloads that are not
  * PNG/JPEG, and the place a real decoder plugs in is marked.
  *
  * Scale notes: payloads stay distributed (never collected); per-batch
  * decode amortizes decoder init across rows exactly like a vectorized
  * UDF; frame sampling is a per-row narrow op producing an exploded
  * row-per-frame layout that downstream operators can repartition on.
  */
object Multimodal {

  /** Decoded media metadata (what a real decoder would return). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, duration_ms: Long, ok: Boolean)

  /** Attach an opaque binary payload column. In production this is the
    * raw image/audio/video bytes (e.g. read from object storage); here
    * the UTF-8 bytes of a text column stand in so the pipeline is
    * runnable end-to-end. */
  def withBinaryPayload(df: DataFrame, sourceCol: String = "text",
      payloadCol: String = "content"): DataFrame =
    df.withColumn(payloadCol, encode(col(sourceCol), "UTF-8"))

  /** Pure-SQL deterministic metadata (mirrors [[stubDecode]] so the
    * operator is oracle-checkable): sizes from the payload, fake
    * dimensions from cheap modular arithmetic. */
  def stubMetaColumns(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val bytes = length(col(payloadCol)) // byte length for binary
    df.withColumn("n_bytes", bytes.cast("bigint"))
      .withColumn("fake_width", (pmod(bytes, lit(1280)) + 16).cast("int"))
      .withColumn("fake_height", (pmod(bytes * 7, lit(720)) + 16).cast("int"))
  }

  /** STUB decoder — replace the body marked below with a real decoder
    * (e.g. javax.imageio / ffmpeg bindings) in an environment that has
    * one. Deterministic: derived solely from payload bytes. */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    // >>> real decoder goes here: e.g. ImageIO.read(new ByteArrayInputStream(payload))
    val n = payload.length.toLong
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(payload.length, 64)) { h = 31 * h + payload(i); i += 1 }
    MediaMeta(docId, n, format = if (n % 2 == 0) "png" else "jpeg",
      width = (math.floorMod(h, 1920L) + 1L).toInt,
      height = (math.floorMod(h / 1920L, 1080L) + 1L).toInt,
      duration_ms = 0L, ok = n > 0)
  }

  /** Batch-decode payloads via `mapPartitions`: one decoder context per
    * partition, rows streamed through it (the JVM shape of a vectorized
    * `mapInPandas` decode). PNG/JPEG payloads get REAL header metadata
    * ([[graft.functions.MediaHeadersImpl]] — format + pixel dimensions
    * from IHDR / SOF bytes); other payloads fall through to the
    * deterministic [[stubDecode]] stand-in for a full decoder. */
  def decodeMeta(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "content"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("bigint"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder init would happen here (amortized)
        batch.map {
          // a null payload (outer join, failed fetch) must yield a
          // filterable row, not an executor NPE that kills the job
          case (id, null) =>
            MediaMeta(id, 0L, "unknown", -1, -1, duration_ms = 0L, ok = false)
          case (id, payload) =>
            graft.functions.MediaHeadersImpl.headerMeta(payload) match {
              case (fmt @ ("png" | "jpeg"), w, h) =>
                MediaMeta(id, payload.length.toLong, fmt, w, h,
                  duration_ms = 0L, ok = w > 0 && h > 0)
              case _ => stubDecode(id, payload)
            }
        }
      }
  }

  /** Pure-Catalyst REAL header metadata: format/width/height columns
    * decoded from PNG IHDR / JPEG SOF bytes by the codegen kernel —
    * no mapPartitions, stays inside whole-stage codegen. Unknown or
    * corrupt headers yield (`unknown`, -1, -1), filterable not fatal. */
  def mediaMetaColumns(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    import graft.functions.MediaHeaders
    df.withColumn("n_bytes", length(col(payloadCol)).cast("bigint"))
      .withColumn("format", MediaHeaders.mediaFormat(col(payloadCol)))
      .withColumn("width", MediaHeaders.mediaWidth(col(payloadCol)))
      .withColumn("height", MediaHeaders.mediaHeight(col(payloadCol)))
  }

  /** Per-frame perceptual hashes for video payloads, via ONE fused
    * [[graft.functions.AviDecodeImpl.videoHashes63]] kernel:
    *   - AVI containers: REAL frames from the `LIST/movi` walk
    *     (stream-0 `00dc`/`00db` chunks in file order), each through
    *     the decoded perceptual hash — an MJPEG-style AVI whose frames
    *     are baseline JPEGs hashes DECODED pixels,
    *   - anything else: the byte-stride frame model (fixed
    *     `frameBytes` slices, every `stride`-th) — bit-for-bit the
    *     previous declarative `substr` + `dhashDecoded` form
    *     (`AviDecodeSpec`'s byte-arm parity test pins it), so non-AVI corpora and every
    *     existing gate oracle replay unchanged.
    * Emits (idCol, frame_idx, fh) — one narrow 8-byte signature per
    * sampled frame, the video analog of the image/audio signature
    * rows; `frame_idx = k * stride` for the k-th sampled frame in
    * both arms (byte-slice index or container frame number). */
  def videoFrameHashes(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "content", frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    require(frameBytes >= 1 && stride >= 1, "frameBytes and stride must be >= 1")
    df.select(col(idCol), posexplode(graft.functions.AviDecode.videoHashes(
        col(payloadCol), lit(frameBytes), lit(stride))))
      .select(col(idCol), (col("pos") * stride).as("frame_idx"),
        col("col").as("fh"))
  }

  /** Video NEAR-dup via aligned frame-hash voting — the canonical
    * frame-signature video-dedup design: two videos are near-dups when
    * at least `minMatched` of their POSITION-ALIGNED sampled frames
    * sit within `maxDistance` bits (a re-encoded copy matches frame
    * for frame; trimmed/retimed edits are out of scope by the aligned
    * contract — document-level minhash over unaligned frame hashes is
    * the relaxation, composable from [[videoFrameHashes]]). Emits
    * (id_a, id_b, n_matched).
    *
    * Shape at 100 TB: frame pairs come from the SAME pigeonhole band
    * machinery as every other signature ([[Dedup.simhashPairs]] over
    * composite (video, frame) keys — never all-pairs), then one narrow
    * aggregate per video pair. Ids must be non-negative and frame
    * counts under 4096 (the composite key budget) — violations raise
    * typed, never mis-pair. */
  def videoNearDupPairs(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "content", frameBytes: Int = 256,
      stride: Int = 4, maxDistance: Int = 3, minMatched: Long = 1L,
      maxBucket: Int = 1000): DataFrame = {
    val fh = videoFrameHashes(df, idCol, payloadCol, frameBytes, stride)
    val maxId = Long.MaxValue / 4096L
    val composite = fh.select(
      when(col(idCol) < 0 || col(idCol) >= maxId || col("frame_idx") >= 4096,
        raise_error(concat(
          lit("Multimodal.videoNearDupPairs: id/frame out of composite "),
          lit("key budget (id in [0, 2^51), frames < 4096) at id="),
          col(idCol).cast("string"))))
        .otherwise(col(idCol).cast("long") * 4096L + col("frame_idx"))
        .as("cid"),
      col("fh"))
    Dedup.simhashPairs(composite, "cid", "fh", maxDistance, maxBucket)
      // aligned positions only; composite ids are non-negative, so the
      // shift/pmod decomposition is exact
      .filter(pmod(col("id_a"), lit(4096L)) === pmod(col("id_b"), lit(4096L)))
      .groupBy(shiftright(col("id_a"), 12).as("id_a"),
        shiftright(col("id_b"), 12).as("id_b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatched)
  }

  /** Frame sampling for video-like payloads: slice the payload into
    * fixed-size chunks and keep every `stride`-th one — the row-per-frame
    * explode layout a real frame sampler produces. Pure Catalyst. */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "content", frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)).cast("double") / frameBytes).cast("int")
    // empty payloads yield NO frames (sequence(0, -1) would descend and
    // emit a phantom index 0)
    val frameIdx = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(stride)) === 0))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), col(payloadCol), posexplode(frameIdx))
      .withColumnRenamed("col", "frame_idx")
      .withColumn("frame", col(payloadCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select(col(idCol), col("frame_idx"), col("pos").as("sample_pos"),
        length(col("frame")).as("frame_bytes"))
  }
}
