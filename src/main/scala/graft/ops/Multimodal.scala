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
