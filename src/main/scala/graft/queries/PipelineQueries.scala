package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.EventStreams

/** Training-data pipeline operators (extension tier, BASELINE.json north
  * star) driven through the oracle gate where SQL-expressible, rows-only
  * otherwise (MinHash/SimHash constants aren't reproducible in SQL).
  *
  * Near-dup operators run against `documents` ∪ a deterministic perturbed
  * copy of a slice (suffix token appended, id + 1,000,000) — the synthetic
  * corpus has no natural near-dups, so planting some makes the candidate
  * generation + verification path do real work and produce stable output.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** documents + perturbed near-duplicates of doc_id < 50. */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select("doc_id", "text", "lang")
    val dups = base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" perturbed suffix token")).as("text"),
        col("lang"))
    base.unionByName(dups)
  }

  private def embeds(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Build (once per data dir) and reuse a persisted IVF+PQ index over the
    * embeddings table — the 100 TB shape: the train + full-corpus encode
    * pass is paid ONCE at write time; every query batch afterwards does a
    * partition-pruned scan of m-byte codes. Memoized so repeated gate/bench
    * invocations exercise the pay-once economics instead of retraining. */
  private val pqIndexCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def pqIndexFor(s: SparkSession, dir: String): String =
    pqIndexCache.getOrElseUpdate(dir, {
      val e = embeds(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-pq-index")
        .resolve("index").toString
      val (cts, cb) = Similarity.trainIvfPq(e, "embedding")
      Similarity.writeIvfPqIndex(e, "vec_id", "embedding", path, cts, cb)
      path
    })

  /** Run `f` with a reduced shuffle-partition count, restoring after.
    * Structured Streaming creates one state-store instance per shuffle
    * partition and commits each of them every micro-batch — at gate/bench
    * data sizes that fixed cost dwarfs the data cost, so the streaming
    * queries run with a handful of state partitions. Results are
    * partition-count independent (decimal sums / dedup). */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Deterministic 64-bit signature from a doc id, expressible in BOTH
    * Spark and ANSI-ish DuckDB SQL (XOR/CASE/shift on small values only —
    * no wraparound arithmetic): base = XOR of fixed constants selected by
    * the bits of `orig % 397`; planted copies (id ≥ 1,000,000) flip
    * 1..4 spread bits chosen by `orig % 5` (0 ⇒ exact dup). */
  private val sigConsts = Seq(-4767286540954276203L, -409945945691060918L,
    -1379700187739999003L, 9118805310061913749L, 3836392971734152462L,
    -8792153768808948482L, -3858317867683981838L, -7883909788743084858L,
    8571704695318784627L)
  private val flipMasks = Seq(8L, 2199023256064L, 144115188084244512L, 4611686035607388164L)

  private def arithSignature(id: Column): Column = {
    val orig = when(id >= 1000000L, id - 1000000L).otherwise(id)
    val group = orig % 397
    val base = sigConsts.zipWithIndex.map { case (c, i) =>
      when(shiftright(group, i).bitwiseAND(lit(1L)) === 1L, lit(c)).otherwise(lit(0L))
    }.reduce(_ bitwiseXOR _)
    val j = orig % 5
    val flip = when(id < 1000000L, lit(0L))
      .otherwise(flipMasks.zipWithIndex.map { case (m, k) =>
        when(j === (k + 1).toLong, lit(m)).otherwise(lit(0L))
      }.reduce(_ bitwiseXOR _))
    base.bitwiseXOR(flip)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup: exact (digest groupBy — one narrow shuffle of 16-byte
    // md5 keys with map-side combine; never ships document text)
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroupsByHash(docs(s, dir), "text", "doc_id")
        .select(col("canonical_id"), col("dup_count"))
        .orderBy(col("canonical_id"))),

    // ---- dedup: MinHash + LSH banding, Jaccard-verified, transitive-
    // closure survivors (fused shingle kernel)
    "d02_minhash_dedup" -> ((s, dir) => {
      // no caching needed here: candidate generation materializes its own
      // (id, shingles) cache internally and releases it; the anti-join
      // left side prunes the shingles column away entirely
      val withShingles = docsWithNearDups(s, dir)
        .withColumn("shingles", Dedup.textShingles(col("text"), 3))
      // near-exhaustive banding + lifted cap so the survivor set equals
      // the DuckDB oracle's exact-Jaccard + recursive-CTE closure: the
      // corpus gap (min true-pair jaccard 0.69 vs max false 0.07) makes
      // 32 bands × 2 rows miss-free (miss ≈ (1-0.69²)^32 ≈ 8e-10) at a
      // fraction of 1-row-band candidate volume
      Dedup.nearDedup(withShingles, "doc_id", "shingles", threshold = 0.6,
          numHashes = 64, numBands = 32, maxBucket = Int.MaxValue)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // ---- dedup: SimHash signatures + hamming pairs via pigeonhole bands
    "d03_simhash_pairs" -> ((s, dir) => {
      val sh = docsWithNearDups(s, dir)
        .withColumn("simhash", Dedup.simhash(TextAnalysis.tokens(col("text"))))
      Dedup.simhashPairs(sh, "doc_id", "simhash", maxDistance = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: the simhashPairs DISTRIBUTED operator (pigeonhole band
    // join + hamming verify) oracle-checked end-to-end. The text→simhash
    // kernel itself is not SQL-expressible (see COVERAGE.md d03 note), so
    // this gate feeds the operator an arithmetic signature both engines
    // compute identically: XOR of fixed 64-bit constants selected by the
    // doc-group's bits, with 1..4 planted bit-flips on copied docs —
    // exercising banding, bucket-local pair generation, hamming count and
    // the ≤ maxDistance filter against DuckDB's exact all-pairs answer.
    "d07_simhash_bands" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id")
      val corpus = base.unionByName(
        base.filter(col("doc_id") < 50).select((col("doc_id") + 1000000L).as("doc_id")))
      val sig = corpus.withColumn("sig", arithSignature(col("doc_id")))
      Dedup.simhashPairs(sig, "doc_id", "sig", maxDistance = 3, maxBucket = Int.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: n-gram Jaccard verification on LSH candidates.
    // Oracle-checked against DuckDB's EXACT all-pairs Jaccard: 2-row
    // bands are miss-free on this corpus (min true-pair jaccard 0.69 →
    // miss ≈ (1-0.69²)^32 ≈ 8e-10) while keeping the candidate set small;
    // maxBucket is lifted because the oracle has no skew-drop notion
    // (the capped default is the production path).
    "d04_ngram_jaccard" -> ((s, dir) => {
      val withShingles = docsWithNearDups(s, dir)
        .withColumn("shingles", Dedup.textShingles(col("text"), 3))
      Dedup.nearDupPairs(withShingles, "doc_id", "shingles", threshold = 0.6,
          numHashes = 64, numBands = 32, maxBucket = Int.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: embedding-cosine near-dups via hyperplane LSH buckets
    "d05_embed_neardup" -> ((s, dir) => {
      val base = embeds(s, dir).select("vec_id", "embedding")
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
      val all = base.unionByName(planted)
      Similarity.embeddingNearDups(all, "vec_id", "embedding",
          threshold = 0.995, dim = 64)
        .select(col("id_a"), col("id_b")).orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity: exact brute-force cosine top-k (two-stage top-k)
    "s01_ann_topk" -> ((s, dir) => {
      val e = embeds(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- similarity: LSH-bucketed ANN (the 100 TB shape; recall tested in spec)
    "s02_ann_lsh" -> ((s, dir) => {
      val e = embeds(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      Similarity.lshTopK(queries, e, "vec_id", "embedding", k = 5, dim = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- similarity: IVF (coarse-quantized) ANN — corpus cells + probes
    "s03_ann_ivf" -> ((s, dir) => {
      val e = embeds(s, dir)
      val queries = e.filter(col("vec_id") < 10)
      Similarity.ivfTopK(queries, e, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- composed corpus-prep pipeline (the end-to-end training-data
    // shape): quality gate → language filter → exact dedup, over a
    // corpus with planted exact copies so the dedup stage does real work.
    // The stopword-ratio filter uses integer arithmetic (20·cnt ≥ words
    // ⇔ ratio ≥ 0.05) so no float comparison can diverge cross-engine.
    "p01_corpus_prep" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id", "text")
      val copies = base.filter(col("doc_id") < 30)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val q = TextAnalysis.qualityMetrics(base.unionByName(copies))
        .filter(col("word_cnt") >= 20 &&
          col("stopword_cnt") * 20 >= col("word_cnt"))
      val l = TextAnalysis.languageId(q).filter(col("lang_pred") === "en")
      Dedup.exactByHash(l, "text", "doc_id")
        .select(col("doc_id"), col("word_cnt"), col("stopword_cnt"))
        .orderBy(col("doc_id"))
    }),

    // ---- similarity: IVF+PQ over a PERSISTED index — 8-byte codes
    // instead of 256-byte vectors in the candidate join, quantizers
    // trained and corpus encoded once at index-write time, query batches
    // served by partition-pruned scans (rows-only: trained quantizer +
    // codebooks have no SQL equivalent; recall asserted in spec)
    "s04_ann_ivfpq" -> ((s, dir) => {
      val queries = embeds(s, dir).filter(col("vec_id") < 10)
      Similarity.ivfPqTopKIndexed(s, pqIndexFor(s, dir), queries,
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- text: token counting (whitespace + BPE-ish regex)
    "t01_token_counts" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy(col("doc_id"))),

    // ---- text: quality metrics
    "t02_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(docs(s, dir))
        .select(col("doc_id"), col("char_len"), col("word_cnt"), col("punct_cnt"),
          col("digit_cnt"), col("stopword_cnt"), col("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // ---- text: language id (heuristic; deterministic)
    "t03_langid" -> ((s, dir) =>
      TextAnalysis.languageId(docs(s, dir))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))),

    // ---- text: vocabulary document frequency (terms in ≥ 20% of docs;
    // 5·df ≥ N in integer arithmetic so no float boundary cross-engine)
    "t06_doc_freq" -> ((s, dir) => {
      val d = docs(s, dir)
      val total = d.count()
      TextAnalysis.documentFrequency(d)
        .filter(col("doc_freq") * 5 >= total)
        .orderBy(col("term"))
    }),

    // ---- dedup: decontamination — probes are substrings lifted from the
    // first 20 docs (words 4..11 of the normalized text), so hits are
    // guaranteed and every match is verified by exact substring containment
    "d06_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      val probes = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("probe_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 4, 8)).as("probe"))
        .filter(size(TextAnalysis.tokens(col("text"))) >= 11)
      TextAnalysis.contaminated(d, "doc_id", "text", probes, "probe_id", "probe")
        .orderBy(col("probe_id"), col("doc_id"))
    }),

    // ---- text: repetition metrics over documents + planted 3×-repeated
    // docs (the synthetic corpus has no natural line repetition)
    "t07_repetition" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id", "text")
      val planted = base.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws("\n", col("text"), col("text"), col("text")).as("text"))
      TextAnalysis.repetitionMetrics(base.unionByName(planted), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ---- text: edit-distance similarity vs a probe string. Non-ASCII is
    // folded to '#' first: Spark's levenshtein counts codepoints while
    // DuckDB's counts BYTES, so distances only agree on 1-byte chars.
    "t05_edit_distance" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        levenshtein(
          substring(regexp_replace(col("text"), "[^\\x00-\\x7F]", "#"), 1, 30),
          lit("the fast key order sort table")).as("edit_dist"))
        .filter(col("edit_dist") <= 20)
        .orderBy(col("doc_id"))),

    // ---- text: fingerprinting (md5 canonical + shingle-min rolling hash)
    "t04_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy(col("doc_id"))),

    // ---- multimodal: binary payload + deterministic stub metadata
    "mm01_media_meta" -> ((s, dir) => {
      val withPayload = Multimodal.withBinaryPayload(docs(s, dir))
      Multimodal.stubMetaColumns(withPayload)
        .select(col("doc_id"), col("n_bytes"), col("fake_width"), col("fake_height"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal: frame sampling plumbing (row-per-frame explode)
    "mm02_frame_sample" -> ((s, dir) => {
      val withPayload = Multimodal.withBinaryPayload(docs(s, dir))
      Multimodal.sampleFrames(withPayload)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"),
          sum(col("frame_bytes")).as("sampled_bytes"))
        .orderBy(col("doc_id"))
    }),

    // ---- events: tumbling-window stats (same code runs on streams)
    "e01_tumbling_stats" -> ((s, dir) =>
      EventStreams.tumblingStats(Tables.load(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),

    // ---- events: gap-based sessionization
    "e02_sessions" -> ((s, dir) =>
      EventStreams.sessionizeBatch(Tables.load(s, dir, "events"))
        .orderBy(col("user_id"))),

    // ---- events: session_window operator (streaming-capable) — session
    // start = first event ts, events merged within the 30min gap
    "e07_session_window" -> ((s, dir) =>
      EventStreams.sessionWindowStats(Tables.load(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))),

    // ---- events: as-of join — each purchase matched to the user's most
    // recent prior click (oracle: DuckDB's native ASOF JOIN)
    "e05_asof_join" -> ((s, dir) => {
      val events = Tables.load(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = events.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      graft.ops.AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
          payloadCols = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("prior_click_id"),
          col("asof_value").as("prior_click_value"))
        .orderBy(col("event_id"))
    }),

    // ---- events: streaming dedup — the input is staged TWICE; after
    // dropDuplicatesWithinWatermark on event_id the per-type counts must
    // hash-match the single-copy batch oracle
    "e08_streaming_dedup" -> ((s, dir) => {
      val sink = "e08_dedup_out"
      val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-")
      streamDir.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events_a.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events_b.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = EventStreams.readStreamNanos(s, streamDir.toString)
      withShufflePartitions(s, 4) {
        val q = EventStreams.streamingDedup(stream, watermark = "87600 hours")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      val out = s.table(sink)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
      out.cache().count()
      out
    }),

    // ---- events: keyed range join — events inside each user's first
    // active hour (binned equi-join, no nested loop)
    "e06_range_join" -> ((s, dir) => {
      val events = Tables.load(s, dir, "events")
      val intervals = events.groupBy(col("user_id").as("k"))
        .agg(min(col("ts")).as("start"))
        .withColumn("iv_end", col("start") + expr("INTERVAL 1 HOUR"))
        .select(col("k").as("user_id"), col("start"), col("iv_end"))
      graft.ops.RangeJoin.pointInInterval(
          events.select("event_id", "user_id", "ts"), intervals,
          "user_id", "ts", "start", "iv_end", payloadCols = Seq("start"))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    // ---- events: sliding-window stats (1h window, 15min slide)
    "e04_sliding_stats" -> ((s, dir) =>
      EventStreams.slidingStats(Tables.load(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),

    // ---- events: the SAME tumbling aggregation through Structured
    // Streaming (AvailableNow trigger, watermark, memory sink) — must
    // hash-match the batch oracle, proving batch/stream parity
    "e03_streaming_tumbling" -> ((s, dir) => {
      val sink = "e03_streaming_out"
      // the file-stream source requires a directory: stage the table file
      val streamDir = java.nio.file.Files.createTempDirectory("graft-stream-")
      streamDir.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = EventStreams.readStreamNanos(s, streamDir.toString)
      withShufflePartitions(s, 4) {
        val q = EventStreams.streamingTumblingStats(stream)
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      // materialize: the memory sink table is mutable session state
      val out = s.table(sink)
        .orderBy(col("window_start"), col("event_type"))
      out.cache().count()
      out
    })
  )

  /** DuckDB oracle for the language-ID scorer, generated from the SAME
    * [[TextAnalysis.LangProfiles]] word lists the Spark implementation
    * uses. Struct-argmax is encoded as a zero-padded sortable string
    * (DuckDB `greatest` can't compare structs); tie-breaking (max lang
    * string on equal score) matches Spark's struct comparison. */
  private def langidOracle: String = {
    val scored = TextAnalysis.LangProfiles.toSeq.map { case (lang, words) =>
      val list = words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
      s"printf('%06d', len(list_filter(tk, x -> list_contains($list, x)))) || '$lang'"
    }.mkString(", ")
    s"""WITH t AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
       |  FROM documents),
       |s AS (SELECT doc_id, text, greatest($scored) AS best FROM t),
       |p AS (SELECT CASE
       |   WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |   WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
       |   WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
       |   WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
       |   ELSE substr(best, 7) END AS lang_pred FROM s)
       |SELECT lang_pred, COUNT(*) AS n FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB oracle for the composed corpus-prep pipeline, generated from
    * the SAME stopword/profile lists as the Spark implementation. */
  private def corpusPrepOracle: String = {
    def lst(words: Seq[String]) =
      words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")
    val stop = lst(TextAnalysis.LangProfiles("en"))
    val scored = TextAnalysis.LangProfiles.toSeq.map { case (lang, words) =>
      s"printf('%06d', len(list_filter(tk, x -> list_contains(${lst(words)}, x)))) || '$lang'"
    }.mkString(", ")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id < 30
       |), t AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk
       |  FROM corpus),
       |q AS (SELECT doc_id, text, tk,
       |    len(tk) AS word_cnt,
       |    len(list_filter(tk, x -> list_contains($stop, x))) AS stopword_cnt
       |  FROM t
       |  WHERE len(tk) >= 20
       |    AND 20 * len(list_filter(tk, x -> list_contains($stop, x))) >= len(tk)),
       |p AS (SELECT doc_id, text, word_cnt, stopword_cnt, CASE
       |   WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |   WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
       |   WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
       |   WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
       |   ELSE substr(greatest($scored), 7) END AS lang_pred FROM q)
       |SELECT doc_id, CAST(word_cnt AS INTEGER) AS word_cnt,
       |  CAST(stopword_cnt AS INTEGER) AS stopword_cnt
       |FROM p
       |WHERE lang_pred = 'en'
       |  AND doc_id IN (SELECT min(doc_id) FROM p WHERE lang_pred = 'en' GROUP BY text)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for d07: exact all-pairs hamming over the SAME
    * arithmetic signature (generated from the same constants as
    * [[arithSignature]], so the two can never drift). All DuckDB ops
    * here (xor, CASE, >> on values < 512, bit_count) are
    * overflow-safe — unlike the real XXH64 kernel, see COVERAGE.md. */
  private def simhashBandsOracle: String = {
    val base = sigConsts.zipWithIndex.map { case (c, i) =>
      s"CASE WHEN ((orig % 397) >> $i) & 1 = 1 THEN CAST($c AS BIGINT) ELSE 0 END"
    }.reduce((a, b) => s"xor($a,\n      $b)")
    val flip = "CASE WHEN doc_id < 1000000 THEN 0 " +
      flipMasks.zipWithIndex.map { case (m, k) =>
        s"WHEN orig % 5 = ${k + 1} THEN CAST($m AS BIGINT) "
      }.mkString + "ELSE 0 END"
    s"""WITH corpus AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id FROM documents WHERE doc_id < 50
       |), o AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id >= 1000000 THEN doc_id - 1000000 ELSE doc_id END AS orig
       |  FROM corpus
       |), sig AS (
       |  SELECT doc_id, xor($base,
       |      $flip) AS sh
       |  FROM o
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "t03_langid" -> langidOracle,
    "p01_corpus_prep" -> corpusPrepOracle,
    "d07_simhash_bands" -> simhashBandsOracle,

    "t06_doc_freq" ->
      """SELECT term, COUNT(*) AS doc_freq
        |FROM (SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0))) AS term
        |  FROM documents)
        |GROUP BY term
        |HAVING COUNT(*) * 5 >= (SELECT COUNT(*) FROM documents)
        |ORDER BY term""".stripMargin,

    "t07_repetition" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |    text || chr(10) || text || chr(10) || text AS text
        |  FROM documents WHERE doc_id < 10
        |), lines AS (
        |  SELECT doc_id,
        |    list_filter([trim(x) for x in string_split(text, chr(10))],
        |      l -> len(l) > 0) AS ls
        |  FROM corpus
        |), linestats AS (
        |  SELECT doc_id, len(ls) AS n_lines,
        |    CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
        |      / greatest(len(ls), 1) AS dup_line_ratio
        |  FROM lines
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus
        |), grams AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |         ELSE [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    END) AS gram
        |  FROM toks
        |), gs AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
        |), gstats AS (
        |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_gram_frac
        |  FROM gs GROUP BY 1
        |)
        |SELECT l.doc_id, CAST(l.n_lines AS INTEGER) AS n_lines,
        |  l.dup_line_ratio, g.top_gram_frac
        |FROM linestats l JOIN gstats g USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "d06_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents
        |), p AS (
        |  SELECT doc_id AS probe_id,
        |    array_to_string(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0)[4:11], ' ') AS probe
        |  FROM documents
        |  WHERE doc_id < 20
        |    AND len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) >= 11
        |)
        |SELECT p.probe_id, d.doc_id
        |FROM p JOIN d ON instr(d.nt, p.probe) > 0
        |ORDER BY probe_id, doc_id""".stripMargin,
    // exact-Jaccard pairs + full transitive closure via recursive CTE:
    // the minhash pipeline's survivor set (only each component's minimum
    // id survives) must equal the exact computation
    "d02_minhash_dedup" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    text || ' perturbed suffix token' AS text
        |  FROM documents WHERE doc_id < 50
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS tk
        |  FROM corpus
        |), sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks
        |), pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |        / greatest(len(list_distinct(a.s || b.s)), 1) AS jaccard
        |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  ) WHERE jaccard >= 0.6
        |), sym AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL
        |  SELECT id_b AS a, id_a AS b FROM pairs
        |), reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
        |), losers AS (
        |  SELECT id FROM reach GROUP BY id HAVING min(r) < id
        |)
        |SELECT doc_id FROM corpus
        |WHERE doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin,

    // exact all-pairs cosine: the hyperplane-LSH path must find every
    // pair ≥ 0.995 (planted pairs are exactly parallel, so they never
    // straddle a sign boundary; nearest natural pair sits at cos ≈ 0.51)
    "d05_embed_neardup" ->
      """WITH allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, [x * 1.01 for x in embedding] AS embedding
        |  FROM embeddings WHERE vec_id < 20
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.995
        |ORDER BY id_a, id_b""".stripMargin,

    // exact all-pairs Jaccard over the same word-3-gram shingles — the
    // LSH path must reproduce it exactly (see the d04 query comment)
    "d04_ngram_jaccard" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    text || ' perturbed suffix token' AS text
        |  FROM documents WHERE doc_id < 50
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS tk
        |  FROM corpus
        |), sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks
        |)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / greatest(len(list_distinct(a.s || b.s)), 1) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |) WHERE jaccard >= 0.6 ORDER BY id_a, id_b""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin,

    "s01_ann_topk" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS INTEGER) AS rank,
        |    e.vec_id AS neighbor_id
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q, embeddings e
        |  WHERE e.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "t01_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS INTEGER) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t02_quality" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS tk,
        |    text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(text) AS INTEGER) AS char_len,
        |  CAST(len(tk) AS INTEGER) AS word_cnt,
        |  CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS INTEGER) AS punct_cnt,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS digit_cnt,
        |  CAST(len(list_filter(tk, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that'], t))) AS INTEGER) AS stopword_cnt,
        |  CAST(len(list_filter(tk, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that'], t))) AS DOUBLE)
        |    / greatest(len(tk), 1) AS stopword_ratio
        |FROM toks ORDER BY doc_id""".stripMargin,

    "t05_edit_distance" ->
      """WITH a AS (SELECT doc_id,
        |  substr(regexp_replace(text, '[^\x00-\x7F]', '#', 'g'), 1, 30) AS p
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(levenshtein(p, 'the fast key order sort table') AS INTEGER) AS edit_dist
        |FROM a
        |WHERE levenshtein(p, 'the fast key order sort table') <= 20
        |ORDER BY doc_id""".stripMargin,

    "t04_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm01_media_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 1280 + 16 AS INTEGER) AS fake_width,
        |  CAST((octet_length(encode(text)) * 7) % 720 + 16 AS INTEGER) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "e01_tumbling_stats" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e03_streaming_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e05_asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  r.event_id AS prior_click_id,
        |  r.value AS prior_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "e08_streaming_dedup" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e06_range_join" ->
      """WITH iv AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS s,
        |         MIN(CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS e
        |  FROM events GROUP BY user_id)
        |SELECT ev.event_id, ev.user_id
        |FROM events ev JOIN iv ON ev.user_id = iv.user_id
        | AND CAST(ev.ts AS TIMESTAMP) >= iv.s AND CAST(ev.ts AS TIMESTAMP) <= iv.e
        |ORDER BY ev.event_id""".stripMargin,

    "e04_sliding_stats" ->
      """SELECT ws AS window_start, event_type, COUNT(*) AS n FROM (
        |  SELECT event_type,
        |    unnest(generate_series(
        |      time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
        |      time_bucket(INTERVAL '15 minutes', ts),
        |      INTERVAL '15 minutes')) AS ws
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "mm02_frame_sample" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        |f AS (SELECT doc_id, nb, unnest(range(0, CAST(ceil(nb / 256.0) AS INT))) AS i FROM b)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |  CAST(SUM(least(256, nb - i * 256)) AS BIGINT) AS sampled_bytes
        |FROM f WHERE i % 4 = 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "e07_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |    CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP))
        |            - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ids AS (
        |  SELECT user_id, tsu,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT MIN(tsu) AS session_start, user_id, COUNT(*) AS n_events
        |FROM ids GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "e02_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP))
        |            - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
