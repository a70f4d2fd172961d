package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double, props: String)

/** Structured Streaming specs: the same operators run on a MemoryStream
  * with watermarks; results checked against the batch formulation. */
class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long, typ: String): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      user, typ, 1.0, "{}")

  test("tumbling stats: identical results in batch and streaming") {
    val events = Seq(
      ev(1, 5, 1, "click"), ev(2, 20, 1, "click"), ev(3, 61, 2, "view"),
      ev(4, 70, 1, "click"), ev(5, 130, 2, "view"))
    val batch = EventStreams.tumblingStats(events.toDF()).orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = EventStreams.streamingTumblingStats(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out").orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming session windows merge sessions across micro-batches") {
    // user 1: events at 10:00 (batch 1) and 10:10 (batch 2) — inside the
    // 30 min gap, so the state store must MERGE them into one session;
    // user 2's events are 40 min apart — two sessions
    val batch1 = Seq(ev(1, 600, 1, "click"), ev(3, 600, 2, "view"))
    val batch2 = Seq(ev(2, 610, 1, "click"), ev(4, 640, 2, "view"))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.sessionWindowStats(stream.toDF())
      .writeStream.format("memory").queryName("sessw_out")
      .outputMode("complete").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("sessw_out")
        .orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      // user 1 → one merged 2-event session; user 2 → two 1-event sessions
      assert(got == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
      val expected = EventStreams.sessionWindowStats((batch1 ++ batch2).toDF())
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      val streamed = spark.table("sessw_out")
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      assert(streamed == expected)
    } finally q.stop()
  }

  test("left-outer interval join: unmatched rows emit once the watermark passes them") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.intervalJoinLeftOuter(
      purchases.toDF().select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts")),
      clicks.toDF().select(col("event_id").as("c_id"), col("user_id"),
        col("ts").as("c_ts")),
      "user_id", "p_ts", "c_ts", "1 HOUR", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("loj_out")
      .outputMode("append").start()
    try {
      // user 1's purchase@10min is matched by their click@9min; user 2
      // NEVER clicks, so their purchase@130min must surface
      // null-extended once the watermark (min of both sources' max ts −
      // 10min = 200min) passes it
      purchases.addData(ev(1, 10, 1, "purchase"), ev(2, 130, 2, "purchase"),
        ev(3, 200, 9, "purchase"))
      clicks.addData(ev(4, 9, 1, "click"), ev(5, 200, 9, "click"))
      q.processAllAvailable()
      // a further pass lets the engine run the no-data batch that
      // applies the advanced watermark to join state
      purchases.addData(ev(6, 210, 9, "purchase"))
      clicks.addData(ev(7, 210, 9, "click"))
      q.processAllAvailable()
      val rows = spark.table("loj_out")
        .select(col("p_id"), col("c_id")).orderBy("p_id", "c_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(rows.contains((1L, 4L)), "matched purchase emits with its click")
      assert(rows.contains((2L, -1L)), "unmatched purchase emits null-extended")
    } finally q.stop()
  }

  test("trained quality classifier scores a document stream statelessly") {
    import graft.ops.Classifier
    val docs = Seq((1L, "good fine great shared"), (2L, "bad awful poor shared"),
      (3L, "good nice fine words"), (4L, "poor bad awful words"))
    val df = docs.toDF("doc_id", "text")
    val labels = df.select(col("doc_id"),
      when(col("doc_id") % 2 === 1, 1).otherwise(-1).as("y"))
    val model = Classifier.trainCentroid(
      Classifier.hashedFeatures(df, "doc_id", "text", 64), labels)
    def scored(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), Classifier.localMargin(col("text"), model, 64).as("margin"),
        Classifier.localPred(col("text"), model, 64).as("pred"))
    val batch = scored(df).orderBy("doc_id").collect().map(_.toSeq).toSeq

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs: _*)
    // row-local margins: plain append-mode projection, no state store
    val q = scored(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("clf_out").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("corpus-prep transforms (quality + langid) are stream-capable and match batch") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "the cat and the dog sat on the mat in the house by the tree with a hat"),
      (2L, "der hund und die katze ist nicht ein haus und der baum mit der tür"),
      (3L, "short text"))
    def prep(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.languageId(TextAnalysis.qualityMetrics(df))
        .select("doc_id", "word_cnt", "stopword_cnt", "lang_pred")
    val batch = prep(docs.toDF("doc_id", "text")).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs: _*)
    // stateless projections: the identical transform chain runs in
    // append mode with no watermark — the streaming corpus-prep shape
    val q = prep(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("prep_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("prep_out").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup by event_id within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(ev(1, 5, 1, "click"), ev(1, 5, 1, "click"), ev(2, 6, 1, "view"))
    val q = EventStreams.streamingDedup(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming bloom screen: admits first occurrences once, never re-admits across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("bloom-screen")
    val idx = dir.resolve("idx").toString
    val outP = dir.resolve("out").toString
    val seed = (0 until 10).map(i => ("k", "seed" + i)).toDF("key", "v")
    graft.ops.Sketch.writeBloomIndex(seed, "key", "v", idx, numBits = 8192, numHashes = 4)
    val stream = MemoryStream[(String, String)]
    val q = EventStreams.streamingBloomScreen(stream.toDF().toDF("key", "v"),
      "key", "v", idx, outP, dir.resolve("ck").toString)
    try {
      // batch 1: new values (one duplicated IN-batch → one row) + a seeded value
      stream.addData(("k", "a"), ("k", "a"), ("k", "seed3"), ("k", "b"))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect().map(_.getString(1)).sorted.toSeq
      assert(out1 == Seq("a", "b"), s"batch-1 admissions: $out1")
      // batch 2: batch-1 admissions screened out by their appended bits;
      // genuinely new value still passes (append-while-probing); a null
      // value is never admitted (its bits could never be stored, so
      // admitting it would re-emit it every batch)
      stream.addData(("k", "a"), ("k", "c"), ("k", "seed7"),
        ("k", null.asInstanceOf[String]))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect().map(_.getString(1)).sorted.toSeq
      assert(out2 == Seq("a", "b", "c"), s"after batch 2: $out2")
    } finally q.stop()
    // the persisted index absorbed the admissions across batches
    val probe = Seq(("k", "a"), ("k", "c"), ("k", "zz-new")).toDF("key", "value")
    val m = graft.ops.Sketch.probeBloomIndex(spark, idx, probe, "key", "value")
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(m("a") && m("c") && !m("zz-new"))
  }

  test("streaming exact-dedup screen: first occurrence admitted once, min-id in batch, exact across runs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("exact-screen")
    val idx = dir.resolve("idx").toString
    val outP = dir.resolve("out").toString
    val seed = Seq((0L, "seeded-a"), (1L, "seeded-b")).toDF("doc_id", "content")
    graft.ops.Dedup.writeDigestIndex(seed, "content", idx)
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.streamingExactDedupScreen(
      stream.toDF().toDF("doc_id", "content"),
      "content", "doc_id", idx, outP, dir.resolve("ck").toString)
    try {
      // batch 1: in-batch dup keeps min id; seeded content screened;
      // null content never admitted (would re-admit every batch)
      stream.addData((10L, "x"), (12L, "x"), (11L, "seeded-a"),
        (13L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect()
        .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
      assert(out1 == Seq(10L -> "x"), s"batch-1 admissions: $out1")
      // batch 2: batch-1 admission screened EXACTLY (no false drops:
      // a brand-new content always passes), seeded still screened
      stream.addData((20L, "x"), (21L, "y"), (22L, "seeded-b"))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect()
        .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
      assert(out2 == Seq(10L -> "x", 21L -> "y"), s"after batch 2: $out2")
    } finally q.stop()
    // the index absorbed the admissions: a restarted run still screens
    val cleaned = graft.ops.Dedup.probeDigestIndex(spark, idx,
      Seq((30L, "x"), (31L, "y"), (32L, "z")).toDF("doc_id", "content"),
      "content", "doc_id")
    assert(cleaned.collect().map(_.getLong(0)).toSeq == Seq(32L))
  }

  test("streaming media screen: re-encodes rejected, novels absorbed, in-batch dominance, null dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("media-screen")
    val idx = dir.resolve("idx").toString
    val outP = dir.resolve("out").toString
    def saw(core: Int, slope: Int): Array[Byte] =
      Array.tabulate(200 + core % 50)(i => ((core * 31 + i * slope) % 251).toByte)
    def reenc(b: Array[Byte]): Array[Byte] = b.zipWithIndex.map { case (v, i) =>
      if ((i >> 4) % 8 == 0) math.min(255, (v & 0xFF) + 40).toByte else v }
    graft.ops.Dedup.writePhashIndex(
      (0 until 10).map(c => (c.toLong, saw(c, 7))).toDF("doc_id", "content"),
      "doc_id", "content", idx)
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = EventStreams.streamingMediaScreen(
      stream.toDF().toDF("doc_id", "content"),
      "doc_id", "content", idx, outP, dir.resolve("ck").toString)
    try {
      // batch 1: a re-encode of seeded media is rejected; a novel is
      // admitted; the novel's in-batch re-encode is dominated (higher
      // id); a null payload is dropped
      stream.addData((100L, reenc(saw(2, 7))), (101L, saw(50, 11)),
        (102L, reenc(saw(50, 11))), (103L, null.asInstanceOf[Array[Byte]]))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out1 == Seq(101L), s"batch-1 admissions: $out1")
      // batch 2: a re-encode of batch-1's ADMITTED novel is rejected
      // (the index grew — absorb proven); a new novel is admitted
      stream.addData((200L, reenc(saw(50, 11))), (201L, saw(60, 13)))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out2 == Seq(101L, 201L), s"after batch 2: $out2")
    } finally q.stop()
    // the banding distance is memoized per path: two micro-batches
    // cost ONE _meta sidecar load, not one per batch — a long-lived
    // screen stays off the metadata path (null-safe: a regression that
    // never loads the sidecar must fail the assert, not NPE)
    def metaLoads = Option(graft.ops.Dedup.phashMetaReads.get(idx))
      .map(_.get()).getOrElse(0L)
    assert(metaLoads == 1L, s"expected one _meta load, saw $metaLoads")
    // the persisted index absorbed both admissions: a fresh probe of
    // their re-encodes matches without the stream running
    val probe = Seq((300L, reenc(saw(50, 11))), (301L, reenc(saw(60, 13))))
      .toDF("doc_id", "content")
    val m = graft.ops.Dedup.probePhashIndex(spark, idx, probe, "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((300L, 101L), (301L, 201L)), s"$m")
    // the fresh probe above also rode the memo: still ONE load total
    assert(metaLoads == 1L, s"post-probe: expected one _meta load, saw $metaLoads")
  }

  test("streaming entity screen: known spellings rejected, novels absorbed, in-batch dominance, null dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("entity-screen")
    val idx = dir.resolve("idx").toString
    val outP = dir.resolve("out").toString
    val catalog = Seq((0L, "small ring"), (1L, "red widget"), (2L, "blue bolt"))
      .toDF("clean_id", "name")
    graft.ops.FuzzyJoin.writeFuzzyIndex(catalog, "clean_id", "name", depth = 1, idx)
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.streamingEntityScreen(
      stream.toDF().toDF("id", "name"),
      "id", "name", idx, outP, dir.resolve("ck").toString)
    try {
      // batch 1: a typo of a catalog name is rejected; a novel is
      // admitted; the novel's in-batch typo is dominated (higher id);
      // a null name is dropped
      stream.addData((100L, "smal ring"), (101L, "grey flange"),
        (102L, "gry flange"), (103L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out1 == Seq(101L), s"batch-1 admissions: $out1")
      // batch 2: a typo of batch-1's ADMITTED novel is rejected (the
      // catalog grew — absorb proven); a new novel is admitted
      stream.addData((200L, "grey flang"), (201L, "teal gasket"))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out2 == Seq(101L, 201L), s"after batch 2: $out2")
    } finally q.stop()
    // the persisted index absorbed the admissions: a fresh batch probe
    // matches them without the stream running (insertion typo — the
    // symmetric-delete neighborhood covers inserts too)
    val m = graft.ops.FuzzyJoin.probeFuzzyIndex(spark, idx,
        Seq((300L, "grey flanges")).toDF("id", "name"), "id", "name", 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(m == Set((300L, 101L)), s"$m")
  }

  test("streaming embedding screen: near-dups rejected, novels absorbed, in-batch dominance, null dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("embed-screen")
    val idx = dir.resolve("idx").toString
    val outP = dir.resolve("out").toString
    def vec(seed: Int): Seq[Double] = {
      val rnd = new scala.util.Random(seed * 6131 + 17)
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    }
    def scaled(v: Seq[Double], f: Double): Seq[Double] = v.map(_ * f)
    graft.ops.Similarity.writeJlIndex(
      (0 until 30).map(c => (c.toLong, vec(c))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, dim = 64, outDim = 16, bucketBits = 4)
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.streamingEmbeddingScreen(
      stream.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, outP, dir.resolve("ck").toString,
      threshold = 0.95)
    try {
      // batch 1: a scaled copy of an indexed vector is rejected; a
      // novel is admitted; the novel's in-batch scaled copy is
      // dominated (higher id); a null vector is dropped
      stream.addData((100L, scaled(vec(3), 1.25)), (101L, vec(50)),
        (102L, scaled(vec(50), 1.5)), (103L, null.asInstanceOf[Seq[Double]]))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out1 == Seq(101L), s"batch-1 admissions: $out1")
      // batch 2: a scaled copy of batch-1's ADMITTED novel is rejected
      // (the index grew — absorb proven); a new novel is admitted
      stream.addData((200L, scaled(vec(50), 1.25)), (201L, vec(60)))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect().map(_.getLong(0)).sorted.toSeq
      assert(out2 == Seq(101L, 201L), s"after batch 2: $out2")
    } finally q.stop()
    // the persisted index absorbed both admissions: a fresh threshold
    // probe of their copies matches without the stream running
    val m = graft.ops.Similarity.jlMatchedIds(spark, idx,
      Seq((300L, scaled(vec(50), 2.0)), (301L, scaled(vec(60), 0.5)),
        (302L, vec(77))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(m == Set(300L, 301L), s"$m")
  }

  test("streaming LM screen: scores against the static reference; admission is batch-order independent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("lm-screen")
    val lmP = dir.resolve("lm").toString
    val outP = dir.resolve("out").toString
    // reference: "a b" dominates; "a c" rare → P(b|a)=3/4, P(c|a)=1/4
    val ref = Seq((0L, "a b a b a b a c")).toDF("doc_id", "text")
    graft.ops.Lm.writeLmIndex(ref, "doc_id", "text", lmP)
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.streamingLmScreen(
      stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", lmP, outP, minScore = 0.3, dir.resolve("ck").toString)
    try {
      // batch 1: "a b" scores high (P(b|a)=0.75 ≥ 0.3 mean), pure
      // out-of-reference text scores 0, null text dropped, single-token
      // doc dropped (no bigrams)
      stream.addData((10L, "a b a b"), (11L, "z z z z"),
        (12L, null.asInstanceOf[String]), (13L, "a"))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(out1 == Seq((10L, 3L)), s"batch-1 admissions: $out1")
      // batch 2: the SAME doc admitted again — the model is static, so
      // scores are identical across batches (order independence); a
      // borderline doc ("a c": mean 0.25 < 0.3) stays out
      stream.addData((20L, "a b a b"), (21L, "a c"))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(out2.map(t => (t._1, t._2)) == Seq((10L, 3L), (20L, 3L)), s"after batch 2: $out2")
      // identical text → bitwise-identical score in both batches
      assert(out2(0)._3 == out2(1)._3)
    } finally q.stop()
  }

  test("streaming importance screen: static persisted model; exact-long admission; batch-order independent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("imp-screen")
    val mP = dir.resolve("model").toString
    val outP = dir.resolve("out").toString
    // model: target = the 'a' doc, raw = both → ct_a=4 cr_a=4 cr_z=4,
    // Nt=4 Nr=8 B=256 ⇒ w_a = round(1e6·(5·264)/(5·260)) = 1015385,
    // w_z = round(1e6·(1·264)/(5·260)) = 203077 — exact long arithmetic
    // the assertions below replay by hand
    val raw = Seq((0L, "a a a a"), (1L, "z z z z")).toDF("doc_id", "text")
    val target = Seq((0L, "a a a a")).toDF("doc_id", "text")
    graft.ops.Importance.writeImportanceModel(raw, target, "doc_id", "text", mP)
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.streamingImportanceScreen(
      stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", mP, outP, scale = 1000000L, minNum = 1L, minDen = 1L,
      dir.resolve("ck").toString)
    try {
      // batch 1: "a a" clears (per-gram 1015385 > 1e6); all-noise and
      // mixed docs fall short; null text dropped pre-score; empty text
      // scores 0 and 0 > 0 never admits
      stream.addData((10L, "a a"), (11L, "z z"), (12L, "a z"),
        (13L, null.asInstanceOf[String]), (14L, ""))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outP).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(out1 == Seq((10L, 2L, 2030770L)), s"batch-1 admissions: $out1")
      // batch 2: identical text admits again with the IDENTICAL exact
      // score (static model ⇒ order independence); 'z a z' stays out
      // (1421539 < 3e6)
      stream.addData((20L, "a a"), (21L, "z a z"))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outP).collect()
        .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
      assert(out2 == Seq((10L, 2030770L), (20L, 2030770L)), s"after batch 2: $out2")
    } finally q.stop()
  }

  test("streaming drift screen: each batch scores vs what was absorbed before it; replay-safe absorb") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("drift-screen")
    val idx = dir.resolve("idx").toString
    val tel = dir.resolve("tel").toString
    // seed: 100 uniform values 0..99 under key "k"
    val seed = (0L until 100L).map(v => ("k", v)).toDF("key", "v")
    graft.ops.Sketch.writeHistIndex(seed, "key", "v", idx, subBits = 5)
    val stream = MemoryStream[(String, Long)]
    val q = EventStreams.streamingDriftScreen(stream.toDF().toDF("key", "v"),
      "key", "v", idx, tel, dir.resolve("ck").toString, runId = "spec")
    try {
      // batch 0: same distribution → tv ≈ 0 vs the seed
      stream.addData((0L until 100L).map(v => ("k", v)): _*)
      q.processAllAvailable()
      val t0 = spark.read.parquet(tel).collect()
        .map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
      assert(t0 == Seq((0L, "k", 0.0)), s"batch-0 telemetry: $t0")
      // batch 1: disjoint shifted values → tv = 1 vs seed+batch0;
      // a second key unseen by the reference also scores 1.0
      stream.addData(((0L until 100L).map(v => ("k", v + 1000000L)) :+ ("new", 5L)): _*)
      q.processAllAvailable()
      val t1 = spark.read.parquet(tel).collect()
        .map(r => (r.getLong(1), r.getString(2), r.getDouble(3))).sorted.toSeq
      assert(t1 == Seq((0L, "k", 0.0), (1L, "k", 1.0), (1L, "new", 1.0)),
        s"after batch 1: $t1")
    } finally q.stop()
    // the index absorbed both batches: 300 total mass under "k", 1 under "new"
    val merged = graft.ops.Sketch.histMerge(spark.read.parquet(idx))
      .groupBy(col("key")).agg(sum(col("cnt")).as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("k" -> 300L, "new" -> 1L), s"index mass: $merged")
    // replaying an already-published segment tag is a no-op (exactly-once)
    val again = graft.ops.Sketch.publishSegmentOnce(
      graft.ops.Sketch.histSketch(seed, "key", "v", 5), idx, "spec-0")
    assert(!again)
    val merged2 = graft.ops.Sketch.histMerge(spark.read.parquet(idx))
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(merged2 == 301L, s"replay must not double-count: $merged2")
    // a REPLAYED batch whose segment was already absorbed (crash after
    // both writes) must skip entirely: no biased re-score against a
    // reference that contains the batch itself, no duplicate telemetry
    val telCount = spark.read.parquet(tel).count()
    val pre = graft.ops.Sketch.publishSegmentOnce(
      graft.ops.Sketch.histSketch(seed, "key", "v", 5), idx, "replayed-0")
    assert(pre)
    val stream2 = MemoryStream[(String, Long)]
    val q2 = EventStreams.streamingDriftScreen(stream2.toDF().toDF("key", "v"),
      "key", "v", idx, tel, dir.resolve("ck2").toString, runId = "replayed")
    try {
      stream2.addData(("k", 0L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(tel).count() == telCount,
      "an already-absorbed batch must write no telemetry")
    val merged3 = graft.ops.Sketch.histMerge(spark.read.parquet(idx))
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(merged3 == 401L, s"index unchanged beyond the pre-published segment: $merged3")
  }

  test("mapGroupsWithState: per-user state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.statefulUserStats(stream.toDF())
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("update").start()
    try {
      stream.addData(ev(1, 0, 1, "click"), ev(2, 1, 1, "view"))
      q.processAllAvailable()
      stream.addData(ev(3, 2, 1, "purchase"), ev(4, 3, 2, "click"))
      q.processAllAvailable()
      val rows = spark.table("stateful_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(1L) == 3) // state carried over: 2 from batch 1 + 1 from batch 2
      assert(rows(2L) == 1)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch formulation; bounds are inclusive") {
    val purchases = Seq(ev(10, 90, 1, "purchase"), ev(11, 200, 2, "purchase"))
    val clicks = Seq(
      ev(1, 30, 1, "click"),   // exactly 60 min before purchase 10 → inclusive lower bound
      ev(2, 89, 1, "click"),   // in window
      ev(3, 91, 1, "click"),   // after the purchase → out
      ev(4, 29, 1, "click"),   // 61 min before → out
      ev(5, 150, 2, "click"),  // in window for purchase 11
      ev(6, 150, 1, "click"))  // right time, wrong user → out
    def shape(df: org.apache.spark.sql.DataFrame, idAs: String, tsAs: String) =
      df.select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
    val batch = EventStreams.intervalJoin(
        shape(purchases.toDF(), "p_id", "p_ts"),
        shape(clicks.toDF(), "c_id", "c_ts"),
        "user_id", "p_ts", "c_ts", "1 HOUR")
      .select("p_id", "c_id").orderBy("p_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch == Seq((10L, 1L), (10L, 2L), (11L, 5L)))

    implicit val sqlCtx = spark.sqlContext
    val ps = MemoryStream[Ev]
    val cs = MemoryStream[Ev]
    ps.addData(purchases: _*)
    cs.addData(clicks: _*)
    val q = EventStreams.intervalJoin(
        shape(ps.toDF(), "p_id", "p_ts"), shape(cs.toDF(), "c_id", "c_ts"),
        "user_id", "p_ts", "c_ts", "1 HOUR", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out").select("p_id", "c_id")
        .orderBy("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming CDC materialization: micro-batches fold into the parquet snapshot atomically") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("cdc-snap")
    val snap = dir.resolve("snapshot").toString
    val ckpt = dir.resolve("ckpt").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
      .write.parquet(snap)
    val stream = MemoryStream[(Long, String, Double, String, Long)]
    val q = EventStreams.streamingApplyChanges(
      stream.toDF().toDF("id", "name", "v", "op", "seq"), snap, Seq("id"), ckpt)
    try {
      // batch 1: update id=2, insert id=9
      stream.addData((2L, "B2", 200.0, "U", 1L), (9L, "i", 90.0, "I", 1L))
      q.processAllAvailable()
      val after1 = spark.read.parquet(snap).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(after1 == Seq((1L, "a", 10.0), (2L, "B2", 200.0), (3L, "c", 30.0), (9L, "i", 90.0)))
      // batch 2: delete id=1, update the row batch 1 inserted
      stream.addData((1L, "a", 10.0, "D", 2L), (9L, "I9", 99.0, "U", 2L))
      q.processAllAvailable()
      val after2 = spark.read.parquet(snap).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(after2 == Seq((2L, "B2", 200.0), (3L, "c", 30.0), (9L, "I9", 99.0)))
    } finally q.stop()
    // crash window self-heal: snapshot deleted, complete copy at
    // .merging → the next batch's healSwap restores it
    val snapP = new org.apache.hadoop.fs.Path(snap)
    val fs = snapP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(snapP, new org.apache.hadoop.fs.Path(snap + ".merging"))
    graft.ops.FsOps.healSwap(spark, snap + ".merging", snap)
    assert(spark.read.parquet(snap).count() == 3)

    // replay idempotence (the crash-between-swap-and-checkpoint window):
    // re-applying batch 2 to the already-merged snapshot changes nothing
    val replayed = graft.ops.Merge.applyChanges(
      spark.read.parquet(snap),
      Seq((1L, "a", 10.0, "D", 2L), (9L, "I9", 99.0, "U", 2L))
        .toDF("id", "name", "v", "op", "seq"),
      Seq("id"))
    assert(replayed.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((2L, "B2", 200.0), (3L, "c", 30.0), (9L, "I9", 99.0)))
  }

  test("batch sessionization: gap > 30min starts a new session") {
    val events = Seq(
      ev(1, 0, 1, "a"), ev(2, 10, 1, "a"), ev(3, 50, 1, "a"), // gap 40min → 2 sessions
      ev(4, 0, 2, "a")) // single event → 1 session
    val out = EventStreams.sessionizeBatch(events.toDF())
      .orderBy("user_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 3)
    assert(out(1).getLong(1) == 1)
  }

  test("session_window stats match gap semantics") {
    val events = Seq(ev(1, 0, 1, "a"), ev(2, 10, 1, "a"), ev(3, 50, 1, "a"))
    val sessions = EventStreams.sessionWindowStats(events.toDF())
      .filter(col("user_id") === 1).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }

  test("checkpointed file-sink pipeline: restart resumes, no reprocessing, cross-restart dedup") {
    // the production shape: file source → watermarked dedup → parquet sink
    // with a checkpoint; an engine restart must resume from the checkpoint
    // (already-processed input files skipped, dedup state restored) —
    // exactly-once output across restarts
    val in = tmpDir("stream-in")
    val out = tmpDir("stream-out")
    val chk = tmpDir("stream-chk")
    def feed(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(in.toString)
    def runToCompletion(): Unit = {
      val q = EventStreams.streamingDedup(EventStreams.readStream(spark, in.toString))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", chk.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    feed(Seq(ev(1, 0, 1, "click"), ev(1, 1, 1, "click"), ev(2, 2, 2, "view")))
    runToCompletion()
    val after1 = spark.read.parquet(out.toString)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(after1 == Seq(1L, 2L), s"first run must dedup within the batch, got $after1")
    // new input arrives while "down": id 2 repeats (within watermark), id 3 is new
    feed(Seq(ev(2, 3, 2, "view"), ev(3, 4, 3, "click")))
    runToCompletion()
    val after2 = spark.read.parquet(out.toString)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(after2 == Seq(1L, 2L, 3L),
      s"restart must not reprocess run-1 files and must suppress the cross-restart dup, got $after2")
  }
}
