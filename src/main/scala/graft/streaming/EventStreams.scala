package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** Event/time-series operators over the `events` table shape
  * (`event_id, ts, user_id, event_type, value, props`), written so the
  * same transformations run in batch AND Structured Streaming (extension
  * tier — the reference has no streaming at all, SURVEY §1.1).
  *
  * Scale: windowed aggregations shuffle on (window, key) with map-side
  * partial aggregation; watermarks bound state for streaming;
  * sessionization uses `session_window` (streaming-capable) or a
  * lag-based batch formulation for exact oracle checks.
  */
object EventStreams {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based event stream (works on a directory receiving parquet). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** Stream over a directory of driver-testdata `events` parquet files.
    * Streaming reads need an explicit schema, and the driver has shipped
    * `ts` as both TIMESTAMP(NANOS) and naive TIMESTAMP(MICROS) across
    * rounds — so peek at the batch-inferred schema of the directory and
    * pick the conversion: nanos-as-long is floor-divided to micros (the
    * same truncation DuckDB applies, matching [[graft.Tables.load]]);
    * micros (tz'd or naive under the UTC session) pass through. */
  def readStreamNanos(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // not-yet-populated directory (start-stream-then-feed pattern): no
    // file to peek → assume the plain-TIMESTAMP shape of EventSchema
    // (nanos-shaped feeds must pre-populate before starting the stream).
    // Only a PROVABLY empty directory falls back — a real peek failure
    // (corrupt footer, missing ts column) still fails fast.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(hPath) && fs.listStatus(hPath).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
    val tsType =
      if (hasData) spark.read.parquet(path).schema("ts").dataType
      else TimestampType
    val readSchema = StructType(EventSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
    val reader = spark.readStream.schema(readSchema)
    // bound files per micro-batch (e.g. 1 → one batch per staged file, so
    // cross-batch stateful merging is genuinely exercised by gates)
    val raw = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(path)
    if (tsType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }

  /** Tumbling-window counts/sums per event type — identical code path
    * for batch DataFrames and streams. */
  def tumblingStats(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Sliding-window stats. */
  def slidingStats(events: DataFrame, width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming tumbling stats with a watermark bounding state. */
  def streamingTumblingStats(stream: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    tumblingStats(stream.withWatermark("ts", watermark), width)

  /** Streaming exact dedup by event_id within the watermark horizon. */
  def streamingDedup(stream: DataFrame, watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Running per-user state maintained across micro-batches. */
  final case class UserRunningState(
      user_id: Long, n_events: Long, total_value: Double, last_type: String)

  /** Custom stateful streaming via `mapGroupsWithState`: a running
    * per-user aggregate that survives across micro-batches (the shape
    * for bespoke state no built-in aggregation expresses — counters,
    * decaying scores, per-key ML features). State is partitioned by key
    * and checkpointed by the engine; memory is O(active keys). */
  def statefulUserStats(stream: DataFrame): Dataset[UserRunningState] = {
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    stream.selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Double, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunningState, UserRunningState](
        GroupStateTimeout.NoTimeout()) {
        case (userId, events, state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(userId, 0L, 0.0, ""))
          // the group iterator has NO guaranteed order — sort by event
          // time so last_type really is the temporally last event
          val batch = events.toSeq.sortBy(_._4)
          val updated = batch.foldLeft(prev) { (acc, e) =>
            UserRunningState(userId, acc.n_events + 1, acc.total_value + e._3, e._2)
          }
          state.update(updated)
          updated
      }
  }

  /** Stream-stream interval equi-join (batch DataFrames run the same
    * code path): left rows pair with right rows of equal `key` whose
    * `rightTs` lies in [leftTs - before, leftTs]. In streaming, pass
    * `watermark` so BOTH sides carry one — combined with the time-range
    * condition it lets the engine BOUND the join state it retains
    * (right-side state older than watermark + `before` is evicted),
    * which is what makes an unbounded stream-stream join runnable at
    * all; without the range condition state grows forever. Inner joins
    * emit matches immediately (no watermark wait — only outer joins
    * hold rows back).
    *
    * Column contract: `key`, `leftTs`, `rightTs` must be unambiguous —
    * rename the non-key right columns before joining (the duplicate
    * right `key` column is dropped from the output). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, before: String,
      watermark: Option[String] = None, joinType: String = "inner"): DataFrame = {
    val l = watermark.fold(left)(w => left.withWatermark(leftTs, w))
    val r = watermark.fold(right)(w => right.withWatermark(rightTs, w))
    val cond = l(key) === r(key) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs) <= l(leftTs)
    l.join(r, cond, joinType).drop(r(key))
  }

  /** Stream-stream LEFT OUTER interval join: like [[intervalJoin]] but
    * left rows with NO in-range right match are still emitted,
    * null-extended — the "every purchase, matched or not" shape.
    * Matched rows emit immediately (inner semantics); the null-extended
    * rows emit only once the watermark guarantees no further right row
    * can match (right side complete past the row's range), so in a
    * bounded run left rows YOUNGER than the final watermark stay
    * unemitted — callers compare below that cutoff. Both sides MUST be
    * watermarked: the delay is what lets the engine ever declare a left
    * row unmatched. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, before: String,
      watermark: String): DataFrame =
    intervalJoin(left, right, key, leftTs, rightTs, before,
      Some(watermark), "left_outer")

  /** Continuous CDC materialization: fold a change STREAM (target
    * columns + op I/U/D + monotone seq, the
    * [[graft.ops.Merge.applyChanges]] contract) into a parquet snapshot.
    * Each micro-batch merges against the current snapshot and swaps the
    * result in atomically ([[graft.ops.FsOps.swapDirs]]) — readers see
    * either the old or the new snapshot, never a mix.
    *
    * Delivery semantics: the swap is atomic per batch but not
    * transactional with the stream checkpoint, so a crash between swap
    * and checkpoint commit REPLAYS the batch — which is idempotent
    * here: re-applying a batch to the already-merged snapshot upserts
    * identical rows and re-deletes absent keys (the standard
    * foreachBatch at-least-once + idempotent-sink recipe). Cross-batch
    * ordering is the producer's contract: per-key changes must arrive
    * in seq order across batches (within a batch, any order).
    *
    * The snapshot must exist before the stream starts (write an initial
    * — possibly empty — parquet table); its schema defines the target
    * columns. */
  def streamingApplyChanges(changes: DataFrame, snapshotPath: String,
      keys: Seq[String], checkpoint: String, opCol: String = "op",
      seqCol: String = "seq"): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val tmpPath0 = snapshotPath + ".merging"
        // self-heal the swap's crash window (snapshot deleted, complete
        // new copy still at .merging) — otherwise a restarted stream
        // would throw on every replay and never recover
        graft.ops.FsOps.healSwap(spark, tmpPath0, snapshotPath)
        val target = spark.read.parquet(snapshotPath)
        val merged = graft.ops.Merge.applyChanges(target, batch, keys, opCol, seqCol)
        // materialize BEFORE the swap: merged still reads the old
        // snapshot lazily
        merged.write.mode("overwrite").parquet(tmpPath0)
        graft.ops.FsOps.swapDirs(spark, tmpPath0, snapshotPath)
      }
      .start()

  /** Continuous first-occurrence screen over a persisted Bloom index
    * ([[graft.ops.Sketch.writeBloomIndex]]): each micro-batch's DISTINCT
    * (key, value) pairs probe the index, pairs that are
    * definitely-absent (not all bits set) append to the `outPath`
    * parquet feed, and exactly those passed pairs' bits append to the
    * index — so later batches (and later stream runs over the same
    * index) screen against everything previously admitted. The
    * streaming twin of the d10/e11 persisted-artifact pattern.
    *
    * Screen semantics: no previously-admitted (or seeded) value is ever
    * re-emitted — the Bloom no-false-negative guarantee; a small
    * deterministic fraction of genuinely-new values is falsely dropped
    * (classic Bloom false positives — size numBits for the tolerated
    * rate). Order of writes is load-bearing: rows land in `outPath`
    * BEFORE their bits land in the index, so a crash between the two
    * replays the batch as at-least-once duplicates in `outPath`
    * (bit_or re-append is idempotent) — never as silently lost rows,
    * which the reverse order would produce. Downstream reads dedup or
    * tolerate duplicates, as with every foreachBatch parquet sink. */
  def streamingBloomScreen(stream: DataFrame, keyCol: String, valueCol: String,
      indexPath: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // null VALUES are dropped to mirror the index build side (which
        // never stores them): a null probe reports definitely-absent,
        // so without this filter a (key, null) pair would be re-admitted
        // in EVERY batch — its bits can never be stored
        val pairs = batch.select(col(keyCol), col(valueCol))
          .filter(col(valueCol).isNotNull).distinct()
        // probeBloomIndex heals the index's swap crash window first
        val fresh = graft.ops.Sketch
          .probeBloomIndex(spark, indexPath, pairs, keyCol, valueCol)
          .filter(!col("may_contain"))
          .select(col("key").as(keyCol), col("value").as(valueCol))
          .persist()
        try {
          fresh.write.mode("append").parquet(outPath)
          graft.ops.Sketch.appendToBloomIndex(fresh, keyCol, valueCol, indexPath)
        } finally fresh.unpersist()
      }
      .start()

  /** Continuous EXACT first-occurrence screen over a persisted digest
    * index ([[graft.ops.Dedup.writeDigestIndex]]) — the
    * [[streamingBloomScreen]]'s exact twin: each micro-batch is cleaned
    * by [[graft.ops.Dedup.probeDigestIndex]] (in-batch min-id dedup +
    * one narrow anti-join against every digest previously admitted),
    * survivors append to the `outPath` feed and THEN their digests to
    * the index. Exact semantics — no false drops — at the cost of the
    * full digest set (~32 B/doc) instead of a bitmap; pick by whether a
    * deterministic small loss rate is acceptable.
    *
    * Ordering/replay (the e15 reasoning class): rows land in `outPath`
    * BEFORE their digests — a crash between the two replays the batch
    * as at-least-once duplicates in the feed, never as silent loss.
    * Digest re-append is harmless: membership is idempotent under
    * duplicate digest rows ([[graft.ops.Dedup.compactDigestIndex]]
    * restores one-row-per-digest). Null content is dropped, mirroring
    * the index build side — a null digest never matches the anti-join,
    * so an admitted null row would be re-admitted every batch. */
  def streamingExactDedupScreen(stream: DataFrame, contentCol: String,
      idCol: String, indexPath: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val fresh = graft.ops.Dedup.probeDigestIndex(spark, indexPath,
          batch.filter(col(contentCol).isNotNull), contentCol, idCol)
          .persist()
        try {
          fresh.write.mode("append").parquet(outPath)
          graft.ops.Dedup.appendToDigestIndex(fresh, contentCol, indexPath)
        } finally fresh.unpersist()
      }
      .start()

  /** Continuous PERCEPTUAL media admission screen over a persisted
    * phash index ([[graft.ops.Dedup.writePhashIndex]]) — the image-
    * crawl dedup loop: each micro-batch's payloads are hashed ONCE,
    * screened against the index (any band-match within the index's
    * `max_distance` → a re-encode of already-ingested media →
    * rejected), then screened IN-batch by pairwise dominance (a row is
    * dropped iff a SMALLER-id batch-mate band-matches it within
    * distance — deterministic and engine-replayable; note it is
    * dominance, not transitive closure: in a chain a~b~c with a≁c,
    * both b and c drop even though c's dominator b died — documented
    * conservative bias, a screen may drop extra near-dups but must
    * never admit a matched one). Survivors append `(id, ph)` to the
    * admitted feed and THEN their signatures to the index
    * (out-before-index, the e18 ordering: a crash between the two
    * replays as at-least-once duplicate feed rows with identical
    * content — downstream dedups by id — never as loss; signature
    * re-append is inert because probes `distinct()` the index). Later
    * batches screen against the GROWN index, so a re-encode of media
    * admitted two batches ago is rejected. Null payloads / null
    * hashes are dropped (nothing to perceive). */
  def streamingMediaScreen(stream: DataFrame, idCol: String,
      payloadCol: String, indexPath: String, outPath: String,
      checkpoint: String,
      maxBucket: Int = Int.MaxValue): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val hashed = batch.filter(col(payloadCol).isNotNull)
          .select(col(idCol).as("id"),
            graft.functions.PngDecode.dhashDecoded(col(payloadCol)).as("ph"))
          .filter(col("ph").isNotNull)
          .persist()
        try {
          // ONE meta value per screen (memoized per path — the
          // sidecar read happens once per JVM, not per micro-batch;
          // the getter heals the swap crash window before its first
          // read): the in-batch dominance pass below must band with
          // the SAME distance the index probe uses
          val maxDistance =
            graft.ops.Dedup.phashIndexMaxDistance(spark, indexPath)
          // `maxBucket` defaults to UNLIMITED: an admission screen must
          // not trade recall silently — a dropped hot bucket would
          // ADMIT matched media, and each wrong admission grows that
          // bucket further (self-reinforcing). The cost of the default
          // is per-batch probe work ∝ batch size × the HOTTEST index
          // bucket, which grows with the ingested corpus under
          // boilerplate-alike media: a long-lived screen facing that
          // skew should pass a bound here (accepting the documented
          // recall trade on those buckets) or route such media through
          // exact dedup first.
          // no distinct: left_anti ignores build-side duplicates, and the
          // probe's per-id fan-out is banding-bounded — the dedup was one
          // whole exchange+aggregate per micro-batch for nothing (r13)
          val matchedIds = graft.ops.Dedup
            .probePhashSignaturesAt(spark, indexPath, hashed, maxDistance,
              maxBucket = maxBucket, hashKind = graft.ops.Dedup.DhashHashKind)
            .select(col("batch_id").as("id"))
          // persist, not localCheckpoint: afterIndex feeds both the
          // dominance pairs and the admit anti-join (one probe, not
          // two) and stays RECOMPUTABLE — a lineage cut before the
          // two writes is the r4 executor-loss trap
          val afterIndex = hashed.join(matchedIds, Seq("id"), "left_anti")
            .persist()
          try {
            // pairwise dominance via the band pair machinery: every
            // (a < b) within-distance pair dominates b (same maxBucket
            // policy as the index probe above)
            val dominated = graft.ops.Dedup
              .simhashPairs(afterIndex, "id", "ph", maxDistance,
                maxBucket = maxBucket)
              .select(col("id_b").as("id"))
            val admitted = afterIndex.join(dominated, Seq("id"), "left_anti")
              .persist()
            try {
              admitted.write.mode("append").parquet(outPath)
              graft.ops.Dedup.appendPhashSignatures(admitted, indexPath,
                graft.ops.Dedup.DhashHashKind)
            } finally admitted.unpersist()
          } finally afterIndex.unpersist()
        } finally hashed.unpersist()
      }
      .start()

  /** Continuous ENTITY-RESOLUTION admission screen over a persisted
    * deletion-variant index ([[graft.ops.FuzzyJoin.writeFuzzyIndex]]) —
    * the master-data ingest loop: each micro-batch's names probe the
    * index at the STORED depth (any match within Levenshtein ≤ depth →
    * a spelling of an already-known entity → rejected), then screen
    * IN-batch by pairwise dominance (a row drops iff a SMALLER-id
    * batch-mate is within depth — deterministic, engine-replayable;
    * dominance not transitive closure, the e21 conservative-bias
    * contract). Survivors append `(id, name)` to the admitted feed and
    * THEN their deletion variants to the index (out-before-index, the
    * e18 ordering: a crash between the two replays as at-least-once
    * duplicate feed rows — probes match the survivors' own appended
    * rows on replay and reject them, the r12 screen self-match
    * semantics; never loss). Later batches screen against the GROWN
    * catalog, so a typo of an entity admitted two batches ago is
    * rejected. Null names are dropped (nothing to resolve). */
  def streamingEntityScreen(stream: DataFrame, idCol: String,
      nameCol: String, indexPath: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val named = batch.filter(col(nameCol).isNotNull)
          .select(col(idCol).as("id"), col(nameCol).as("name"))
          .persist()
        try {
          // stored depth is memoized per JVM (one sidecar read per
          // screen, not per micro-batch) and the getter heals the swap
          // crash windows before its first read
          val depth = graft.ops.FuzzyJoin.readFuzzyMeta(spark, indexPath)
          // no distinct: left_anti ignores build-side duplicates (the
          // media-screen rationale — one fewer exchange per micro-batch)
          val matched = graft.ops.FuzzyJoin
            .probeFuzzyIndex(spark, indexPath, named, "id", "name", depth)
            .select(col("id"))
          // persist, not localCheckpoint: afterIndex feeds the
          // dominance pairs AND the admit anti-join and must stay
          // recomputable (the r4 executor-loss trap)
          val afterIndex = named.join(matched, Seq("id"), "left_anti")
            .persist()
          try {
            val dominated = graft.ops.FuzzyJoin.fuzzyJoin(
                afterIndex.select(col("id").as("__ida"), col("name").as("__na")),
                afterIndex.select(col("id").as("__idb"), col("name").as("__nb")),
                "__ida", "__na", "__idb", "__nb", maxDist = depth)
              .filter(col("__ida") < col("__idb"))
              .select(col("__idb").as("id"))
            val admitted = afterIndex.join(dominated, Seq("id"), "left_anti")
              .persist()
            try {
              admitted.write.mode("append").parquet(outPath)
              graft.ops.FuzzyJoin.appendToFuzzyIndex(spark, indexPath,
                admitted, "id", "name")
            } finally admitted.unpersist()
          } finally afterIndex.unpersist()
        } finally named.unpersist()
      }
      .start()

  /** Continuous distribution-drift telemetry over a persisted histogram
    * index ([[graft.ops.Sketch.writeHistIndex]]): each micro-batch is
    * sketched with the index's OWN stored subBits, scored against the
    * CURRENT index content via [[graft.ops.Sketch.histDistance]]
    * (per-key total-variation — exact, transcendental-free), the
    * `(run_id, batch_id, key, tv)` rows append to the telemetry feed,
    * and THEN the batch's sketch is absorbed into the index — so batch
    * k scores against seed + batches 0..k−1: the production "alert when
    * today's corpus stops looking like yesterday's" loop. Keys absent
    * from the batch but present in the reference (and vice versa) score
    * 1.0 — vanishing is drift too.
    *
    * Write ordering and replay semantics (the e15/r5 reasoning class):
    * telemetry lands BEFORE the index absorbs the batch. The absorb
    * step is EXACTLY-once ([[graft.ops.Sketch.publishSegmentOnce]] with
    * tag `runId-batchId` — histogram counts are not idempotent under
    * re-append, and a replay that had first folded the batch into its
    * own reference would bias tv toward 0, the one failure a drift
    * alarm must not have). A crash between the two writes replays as a
    * duplicate telemetry row with IDENTICAL content (same batch scored
    * against the same pre-absorb reference) — downstream dedups by
    * (run_id, batch_id, key); a crash after both writes replays as a
    * pure no-op (the segment guard skips the whole body). Empty
    * micro-batches are skipped: "no data arrived" is not "a corpus
    * where every key vanished".
    *
    * `runId` must be unique per stream RUN (it prefixes segment tags):
    * restarting from the same checkpoint reuses batch ids, which the
    * exactly-once guard requires; a NEW run over a new checkpoint
    * restarts batch ids at 0 and needs a fresh runId to not collide.
    * A replayed batch whose segment is already in the index skips the
    * WHOLE body (guard below): the reference now contains the batch's
    * own counts, and re-scoring against it would emit a conflicting
    * biased-low telemetry row — so a crash after both writes replays
    * as a pure no-op, not even a duplicate. */
  def streamingDriftScreen(stream: DataFrame, keyCol: String, valueCol: String,
      indexPath: String, telemetryPath: String, checkpoint: String,
      runId: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // a replayed batch whose segment WAS already absorbed must skip
        // entirely: the index now contains the batch's own counts, so
        // re-scoring would write a conflicting biased-low telemetry row
        // — the suppressed-alarm failure this screen must never have
        val alreadyAbsorbed = graft.ops.Sketch.segmentPublished(
          spark, indexPath, s"$runId-$batchId")
        if (!alreadyAbsorbed && !batch.isEmpty) {
          val subBits = graft.ops.Sketch.readHistMeta(spark, indexPath) // heals
          val batchSketch = graft.ops.Sketch.histSketch(
            batch.select(col(keyCol), col(valueCol)), keyCol, valueCol, subBits)
            .persist()
          try {
            // the telemetry write runs — and fully materializes its
            // lazy read of the index — BEFORE the absorb below, so tv
            // always scores against the pre-absorb reference
            val tv = graft.ops.Sketch.histDistance(
                batchSketch, spark.read.parquet(indexPath))
              .select(lit(runId).as("run_id"), lit(batchId).as("batch_id"),
                col("key"), col("tv"))
            tv.write.mode("append").parquet(telemetryPath)
            val _ = graft.ops.Sketch.publishSegmentOnce(
              batchSketch, indexPath, s"$runId-$batchId")
          } finally batchSketch.unpersist()
        }
      }
      .start()

  /** Continuous CROSS-CORPUS quality screen over a persisted LM index
    * ([[graft.ops.Lm.writeLmIndex]]): each micro-batch's docs are
    * scored against the REFERENCE bigram model (mean P(w2|w1) under
    * reference counts, unseen → 0 — [[graft.ops.Lm.scoreWithLm]]) and
    * docs reading sufficiently like the reference (`lm_score ≥
    * minScore`) append to the admitted feed with their scores. This is
    * the CCNet crawl loop's production shape: the reference corpus is
    * paid for once at index-write time; each crawl batch costs two
    * joins against the bounded model rows.
    *
    * The model is STATIC by design — folding admitted docs back into
    * the reference would make admission order-dependent across batches
    * and replay-biased (the e17 suppressed-alarm class; an adaptive
    * variant needs per-batch exactly-once segment machinery the
    * one-table LM artifact deliberately doesn't have). With a static
    * model the screen is a pure per-batch function: its single append
    * is idempotent in CONTENT, so a crash mid-batch replays as
    * at-least-once duplicate rows with identical values — downstream
    * dedups by id — never as loss or score drift. Null text is dropped
    * (scoreWithLm already drops sub-2-token docs: no bigrams to
    * judge). */
  def streamingLmScreen(stream: DataFrame, idCol: String, textCol: String,
      lmPath: String, outPath: String, minScore: Double,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.ops.Lm.scoreWithLm(spark, lmPath,
            batch.filter(col(textCol).isNotNull), idCol, textCol)
          .filter(col("lm_score") >= minScore)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** Streaming DSIR importance screen: each micro-batch is scored
    * against a persisted importance model
    * ([[graft.ops.Importance.scoreWithModel]]) and docs whose MEAN
    * per-gram weight clears `(minNum/minDen)·scale` land in the
    * admitted feed — `score·minDen > n_grams·scale·minNum`, all exact
    * longs (keep `n_grams·scale·minNum` under 2⁶³: the batch's longest
    * doc times the threshold terms). No-gram docs never clear (0 > 0).
    *
    * The model is STATIC by design, like [[streamingLmScreen]]: an
    * adaptive variant would make admission order-dependent and
    * replay-biased (the e17 class). The screen is a pure per-batch
    * function — crash replay = at-least-once duplicates with identical
    * values, never loss or drift. */
  def streamingImportanceScreen(stream: DataFrame, idCol: String,
      textCol: String, modelPath: String, outPath: String, scale: Long,
      minNum: Long, minDen: Long,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(minDen >= 1L, s"streamingImportanceScreen: minDen=$minDen must be >= 1")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        graft.ops.Importance.scoreWithModel(spark, modelPath,
            batch.filter(col(textCol).isNotNull), idCol, textCol, scale)
          .filter(col("score") * lit(minDen) >
            col("n_grams") * lit(scale) * lit(minNum))
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  /** Stream-static enrichment join: every micro-batch joins against the
    * static dimension frame (broadcast — no stream-side shuffle, no join
    * state to checkpoint; the classic fact-stream × dim-table shape).
    * The static side is re-planned per batch, so a dim table backed by
    * files picks up new FILES but joins each batch consistently. */
  def staticEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "inner")

  /** Session windows (gap-based) — streaming-capable `session_window`. */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n_events"))

  /** Batch sessionization via lag: a new session starts when the gap to
    * the previous event exceeds `gapMinutes`. Exact-arithmetic (micros)
    * so it is oracle-checkable. Returns per-user session summary. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
    flagged
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Continuous SEMANTIC embedding admission screen over a persisted
    * JL candidate index ([[graft.ops.Similarity.writeJlIndex]]) — the
    * embedding-space sibling of [[streamingMediaScreen]] for the
    * SemDeDup-style ingest loop: each micro-batch's vectors are
    * screened against the index (any candidate neighbor with cosine ≥
    * `threshold` → a semantic near-dup of already-ingested data →
    * rejected), then screened IN-batch by same-bucket dominance (a row
    * drops iff a SMALLER-id batch-mate in its sign bucket has cosine ≥
    * threshold — deterministic, engine-replayable; dominance, not
    * closure — the e21 conservative bias). Survivors append `(id, v)`
    * to the admitted feed and THEN their vectors to the index
    * (out-before-index, the e18 ordering: a crash between the two
    * replays as at-least-once duplicate feed rows — downstream dedups
    * by id — never as loss; vector re-append is inert because the
    * probe collapses duplicate index rows). A crash AFTER the index
    * append replays the batch against its own appended rows, which the
    * probe now MATCHES (equal-id index rows are not excluded on the
    * screen path — see [[graft.ops.Similarity.jlMatchedIds]]), so the
    * replay is rejected as duplicate instead of re-admitted; batch and
    * index ids share one id space by contract.
    *
    * MATCH SCOPE IS STATED, NOT SILENT (the r9 screen-recall rule,
    * honestly inverted): the index probe sees the multi-probed-bucket
    * candidate neighborhood ([[graft.ops.Similarity.jlMatchedIds]])
    * and in-batch pairs are same-bucket — the SemDeDup cluster-scoped
    * semantics. A true near-dup outside that scope is ADMITTED; this
    * is the documented JL trade (contrast the phash screen's
    * exhaustive pigeonhole banding). Null ids / null vectors are
    * dropped (nothing to identify), like the media screen's null
    * payloads. */
  def streamingEmbeddingScreen(stream: DataFrame, idCol: String,
      vecCol: String, indexPath: String, outPath: String,
      checkpoint: String, threshold: Double,
      candidates: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val m = graft.ops.Similarity.readJlMetaCached(spark, indexPath)
        // project ONCE per batch (id, v, p, jb, nv) and share it across
        // the index probe, the dominance pass and the index append —
        // the first cut re-ran the projection kernel per consumer.
        // dropDuplicates on id, never a raise: an at-least-once source
        // legitimately replays rows within a batch, and a checkpointed
        // foreachBatch would replay a raising batch FOREVER (the screen
        // decision is identical per id, so dedup loses nothing — the
        // top-k mixed-rank rationale behind jlTopKIndexed's typed raise
        // does not apply to a screen)
        val rows = graft.ops.Similarity.jlProjected(
            batch.filter(col(idCol).isNotNull && col(vecCol).isNotNull),
            idCol, vecCol, m)
          .dropDuplicates("id")
          .persist()
        try {
          val matched = graft.ops.Similarity.jlMatchedIdsProjected(
            spark, indexPath, rows, threshold, candidates)
          // persist, not localCheckpoint: afterIndex feeds both the
          // dominance pass and the admit anti-join and must stay
          // RECOMPUTABLE (the r4 executor-loss trap)
          val afterIndex = rows
            .join(matched.select(col("batch_id").as("id")), Seq("id"), "left_anti")
            .persist()
          try {
            val dominated = graft.ops.Similarity.jlBatchDominatedIds(
              afterIndex, threshold)
            val admitted = afterIndex
              .join(dominated.select(col("batch_id").as("id")), Seq("id"), "left_anti")
              .persist()
            try {
              admitted.select(col("id"), col("v"))
                .write.mode("append").parquet(outPath)
              graft.ops.Similarity.appendToJlIndexProjected(admitted, indexPath)
            } finally admitted.unpersist()
          } finally afterIndex.unpersist()
        } finally rows.unpersist()
      }
      .start()
}
