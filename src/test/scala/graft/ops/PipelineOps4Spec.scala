package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-3 continuation additions: boilerplate-line
  * removal, duplicated-span detection, the persisted MinHash LSH index
  * (continuous-ingest near-dedup), and SemDeDup. */
class PipelineOps4Spec extends SparkSpec {

  import spark.implicits._

  test("removeBoilerplateLines: frequent lines stripped, order kept, empty docs survive") {
    // "BP" appears in 4 docs (>= minDocs 3), "rare" in 2 (< 3)
    val docs = Seq(
      (0L, "alpha\nBP\nbeta"),
      (1L, "BP\ngamma"),
      (2L, "delta\nBP"),
      (3L, "BP"), // every line boilerplate -> empty doc survives
      (4L, "rare\nepsilon"),
      (5L, "rare")).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) == ((0L, "alpha\nbeta", 1L, 2L))) // interior line removed, order kept
    assert(out(1) == ((1L, "gamma", 1L, 1L)))
    assert(out(2) == ((2L, "delta", 1L, 1L)))
    assert(out(3) == ((3L, "", 1L, 0L)))
    assert(out(4) == ((4L, "rare\nepsilon", 0L, 2L)))
    assert(out(5) == ((5L, "rare", 0L, 1L)))
    // partitioning-invariant (the line-frequency join is global state)
    val repart = TextAnalysis.removeBoilerplateLines(
        docs.repartition(7), "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(repart == out.toSet)
    // a doc with the SAME line twice counts once toward the doc frequency
    val twice = Seq((0L, "x\nx"), (1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val kept = TextAnalysis.removeBoilerplateLines(twice, "doc_id", "text", minDocs = 3)
      .filter(col("removed_lines") > 0).count()
    assert(kept == 0L) // x is in only 2 docs
    // NULL text must not drop the document (one row per input doc)
    val withNull = Seq((0L, "a"), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nullRow = TextAnalysis.removeBoilerplateLines(withNull, "doc_id", "text", minDocs = 5)
      .filter(col("doc_id") === 1L).collect()
    assert(nullRow.length == 1 && nullRow.head.getString(1) == "")
  }

  test("topTermsPerGroup: per-group ranks, count-desc then lexicographic ties, k cap") {
    val docs = Seq(
      (0L, "en", "apple apple banana cherry"),
      (1L, "en", "apple banana banana"),
      (2L, "de", "zug zug zug bahn")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.topTermsPerGroup(docs, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // en: apple=3, banana=3 (tie -> lexicographic), cherry=1 cut by k
    assert(out.toList == List(
      ("de", 1, "zug", 3L), ("de", 2, "bahn", 1L),
      ("en", 1, "apple", 3L), ("en", 2, "banana", 3L)))
    // partitioning-invariant (the partial rank stage must not change results)
    val repart = TextAnalysis.topTermsPerGroup(docs.repartition(7), "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(repart == out.toSet)
  }

  test("semanticContamination: planted probes found, clean probes pass, corpus side never shuffles") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.02f, 0f, 0f)),
      (1L, Array(0.5f, 0.5f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0.01f))).toDF("vec_id", "embedding")
    val probes = Seq(
      (100L, Array(1.01f, 0.0202f, 0f, 0f)), // scaled copy of 0 -> contaminated
      (101L, Array(0f, 1.0f, 0f, 0f)))       // clean
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))
    val hits = Similarity.semanticContamination(corpus, probes,
      "vec_id", "embedding", cents, threshold = 0.995)
    assert(hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 0L)))
    // the 100 TB shape: probe side broadcast, corpus side streamed —
    // the plan must contain a broadcast join and NO shuffle exchange of
    // ANY kind (hash, range, single-partition); only broadcast
    // exchanges may appear
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val exchanges = "(\\w*)Exchange".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.forall(_ == "Broadcast"), s"non-broadcast exchanges: $exchanges")
  }

  test("dot kernel fails fast on ragged vectors and null elements") {
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    def failsWith(df: org.apache.spark.sql.DataFrame, msg: String): Unit = {
      val e = intercept[Exception] {
        df.select(Similarity.dot(col("a"), col("b"))).collect()
      }
      assert(chain(e).exists(t => t.getMessage != null && t.getMessage.contains(msg)))
    }
    failsWith(Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b"),
      "lengths differ")
    failsWith(spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) a, array(1.0D, 2.0D) b"),
      "null element")
    // a NULL ARRAY still propagates to a NULL score (not an error)
    val nullArr = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) a, array(1.0D) b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(nullArr.head.isNullAt(0))
  }

  test("duplicatedSpans: cross-doc 8-grams found, short-doc fallback, within-doc repeats count once") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (0L, s"prefix $shared tail0"),
      (1L, s"$shared tail1 stuff"),
      (2L, "totally unrelated words here nothing shared at all"),
      (3L, "tiny doc"), (4L, "tiny doc"), // < 8 tokens: whole text is the span
      (5L, s"$shared middle $shared")) // repeated within one doc
      .toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGram = out.map(g => g._1 -> ((g._2, g._3))).toMap
    assert(byGram(shared) == ((3L, 0L))) // docs 0, 1, 5 (5's repeat counts once)
    assert(byGram("tiny doc") == ((2L, 3L)))
    assert(!out.exists(_._1.contains("unrelated")))
  }

  test("minhash index: write once, probe finds near-dups, append extends the corpus") {
    val mk = (id: Long, text: String) =>
      (id, text)
    val corpus = Seq(
      mk(0L, "the quick brown fox jumps over the lazy dog again and again today"),
      mk(1L, "completely different content about spark shuffles and partitions"),
      mk(2L, "a third unrelated document mentioning parquet files and schemas"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val path = tmpDir("graft-mh-idx").resolve("idx").toString
    Dedup.writeMinhashIndex(corpus, "doc_id", "shingles", path,
      numHashes = 64, numBands = 32)
    // batch: one near-dup of doc 0, one fresh doc
    val batch = Seq(
      mk(100L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      mk(101L, "entirely novel text with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val pairs = Dedup.probeMinhashIndex(spark, path, batch, "doc_id", "shingles",
        threshold = 0.5, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((100L, 0L)))
    assert(pairs.head._3 > 0.5 && pairs.head._3 < 1.0)
    // append the fresh doc, then a copy of it must match on re-probe
    Dedup.appendToMinhashIndex(
      batch.filter(col("doc_id") === 101L), "doc_id", "shingles", path)
    val batch2 = Seq(
      mk(200L, "entirely novel text with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val pairs2 = Dedup.probeMinhashIndex(spark, path, batch2, "doc_id", "shingles",
        threshold = 0.9, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs2.toSet == Set((200L -> 101L)))
    // the maxBucket guard drops mega-buckets: with every corpus doc
    // identical, bucket_n = 3 > maxBucket 2 -> no candidates at all
    val boiler = Seq(mk(0L, "same text"), mk(1L, "same text"), mk(2L, "same text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val bpath = tmpDir("graft-mh-idx2").resolve("idx").toString
    Dedup.writeMinhashIndex(boiler, "doc_id", "shingles", bpath,
      numHashes = 64, numBands = 32)
    val probeBoiler = Dedup.probeMinhashIndex(spark, bpath,
      Seq(mk(300L, "same text")).toDF("doc_id", "text")
        .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles")),
      "doc_id", "shingles", threshold = 0.5, maxBucket = 2)
    assert(probeBoiler.count() == 0L)
  }

  test("minhash index: maxBucket stays exact when a bucket grows across appended segments") {
    val shingled = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val probe = shingled(Seq(900L -> "same text"))
    // bucket built up by appends: 1 base copy + 2 appended segments of 1
    // copy each — each segment's own bucket_n is 1, the LOGICAL bucket
    // holds 3
    val path = tmpDir("graft-mh-seg").resolve("idx").toString
    Dedup.writeMinhashIndex(shingled(Seq(0L -> "same text")),
      "doc_id", "shingles", path, numHashes = 64, numBands = 32)
    Dedup.appendToMinhashIndex(shingled(Seq(1L -> "same text")), "doc_id", "shingles", path)
    Dedup.appendToMinhashIndex(shingled(Seq(2L -> "same text")), "doc_id", "shingles", path)
    // per-segment counts alone would pass bucket_n = 1 <= 2 and return 3
    // pairs; the cross-segment total (3 > 2) must skip the whole bucket
    assert(Dedup.probeMinhashIndex(spark, path, probe, "doc_id", "shingles",
      threshold = 0.5, maxBucket = 2).count() == 0L)
    // a guard wide enough for the logical bucket still finds all copies
    assert(Dedup.probeMinhashIndex(spark, path, probe, "doc_id", "shingles",
        threshold = 0.5, maxBucket = 3)
      .collect().map(_.getLong(1)).toSet == Set(0L, 1L, 2L))
    // compaction folds back to one globally-counted segment: same
    // skip/find behavior, single-scan probe path
    Dedup.compactMinhashIndex(spark, path)
    assert(spark.read.parquet(path + "/meta").count() == 1L)
    assert(Dedup.probeMinhashIndex(spark, path, probe, "doc_id", "shingles",
      threshold = 0.5, maxBucket = 2).count() == 0L)
    assert(Dedup.probeMinhashIndex(spark, path, probe, "doc_id", "shingles",
        threshold = 0.5, maxBucket = 3)
      .collect().map(_.getLong(1)).toSet == Set(0L, 1L, 2L))
  }

  test("minhash index: probe self-heals the compaction crash window for bands AND meta") {
    import java.nio.file.{Files, Paths}
    val shingled = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    val path = tmpDir("graft-mh-heal").resolve("idx").toString
    Dedup.writeMinhashIndex(
      shingled(Seq(0L -> "the quick brown fox jumps over the lazy dog")),
      "doc_id", "shingles", path, numHashes = 64, numBands = 32)
    Dedup.compactMinhashIndex(spark, path)
    // simulate swapDirs dying between delete(dst) and rename(tmp, dst)
    // for BOTH swap-maintained dirs: the complete copy sits at *.compacting
    for (d <- Seq("bands", "meta")) {
      Files.move(Paths.get(path, d), Paths.get(path, d + ".compacting"))
      assert(!Files.exists(Paths.get(path, d)))
    }
    val probe = shingled(Seq(9L -> "the quick brown fox jumps over the lazy dog"))
    val pairs = Dedup.probeMinhashIndex(spark, path, probe, "doc_id", "shingles",
      threshold = 0.5, maxBucket = Int.MaxValue)
    assert(pairs.collect().map(_.getLong(1)).toSet == Set(0L))
    assert(Files.exists(Paths.get(path, "meta")) && Files.exists(Paths.get(path, "bands")))
  }

  test("digest index: write / probe / append / compact lifecycle, crash-window heal") {
    import java.nio.file.{Files, Paths}
    val corpus = Seq((0L, "alpha"), (1L, "beta"), (2L, "alpha")).toDF("doc_id", "text")
    val path = tmpDir("graft-digest").resolve("idx").toString
    Dedup.writeDigestIndex(corpus, "text", path)
    // distinct digests only
    assert(spark.read.parquet(path).count() == 2L)
    // probe: corpus dups dropped, min-id kept per in-batch dup group
    val batch1 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "gamma"), (13L, "delta"))
      .toDF("doc_id", "text")
    val clean1 = Dedup.probeDigestIndex(spark, path, batch1, "text", "doc_id")
    assert(clean1.select("doc_id").as[Long].collect().toSet == Set(11L, 13L))
    // append survivors; a second batch repeating their content is dropped
    Dedup.appendToDigestIndex(clean1, "text", path)
    val batch2 = Seq((20L, "gamma"), (21L, "epsilon"), (22L, "beta"))
      .toDF("doc_id", "text")
    assert(Dedup.probeDigestIndex(spark, path, batch2, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet == Set(21L))
    // compact folds appended segments back to one distinct set
    Dedup.appendToDigestIndex(batch2.filter(col("doc_id") === 21L), "text", path)
    Dedup.compactDigestIndex(spark, path)
    assert(spark.read.parquet(path).count() == 5L) // alpha beta gamma delta epsilon
    assert(spark.read.parquet(path).distinct().count() == 5L)
    // probe self-heals the compaction crash window
    Files.move(Paths.get(path), Paths.get(path + ".compacting"))
    assert(Dedup.probeDigestIndex(spark, path,
        Seq((30L, "zeta"), (31L, "alpha")).toDF("doc_id", "text"), "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet == Set(30L))
    assert(Files.exists(Paths.get(path)))
  }

  test("semanticDedup: within-cell collapse, min-id and quality-aware selection, trained default") {
    // two well-separated direction clusters + a near-identical pair in each
    val base = Seq(
      (0L, Array(1.0f, 0.02f, 0f, 0f)),
      (1L, Array(1.01f, 0.0202f, 0f, 0f)), // near-dup of 0 (same direction)
      (2L, Array(0f, 0f, 1.0f, 0.01f)),
      (3L, Array(0f, 0f, 1.0f, 0.0f)), // close to 2 but not scaled-identical
      (4L, Array(0.7f, 0.7f, 0f, 0f))) // same half-space as 0/1, different direction
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))
    val pairs = Similarity.semanticNearDupPairs(base, "vec_id", "embedding",
        cents, threshold = 0.995)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L), (2L, 3L)))
    // min-id survivors
    val survivors = Similarity.semanticDedup(base, "vec_id", "embedding",
        threshold = 0.995, centroids = Some(cents))
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 2L, 4L))
    // quality-aware: the HIGHER-quality member of each pair survives
    val scored = base.withColumn("q", col("vec_id").cast("double"))
    val best = Similarity.semanticDedup(scored, "vec_id", "embedding",
        threshold = 0.995, centroids = Some(cents), scoreCol = Some("q"))
      .collect().map(_.getLong(0)).toSet
    assert(best == Set(1L, 3L, 4L))
    // Lloyd-trained default (no centroids passed): same near-identical
    // pairs collapse — cluster boundaries can differ, but a scaled copy
    // always shares its original's cell
    val trained = Similarity.semanticDedup(base, "vec_id", "embedding",
        threshold = 0.9999, nList = 2)
      .collect().map(_.getLong(0)).toSet
    assert(!(trained.contains(0L) && trained.contains(1L)))
  }

  test("meanPool: exact element-wise means, partitioning-invariant") {
    val chunks = Seq(
      (0L, Array(1.0f, 2.0f)),
      (0L, Array(3.0f, 6.0f)),
      (1L, Array(5.0f, -1.0f))).toDF("doc_id", "vec")
    val out = Similarity.meanPool(chunks, "doc_id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList))
      .sortBy(_._1)
    assert(out.toList == List(
      (0L, 2L, List(2.0, 4.0)),
      (1L, 1L, List(5.0, -1.0))))
    val repart = Similarity.meanPool(chunks.repartition(5), "doc_id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList))
      .sortBy(_._1)
    assert(repart.toList == out.toList)
  }

  test("knnGraph: per-node ranks within cells, singleton cells give no edges") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.3f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))) // alone in its cell
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2,
        centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    // node 0's nearest is 1 (0.994) then 2 (0.936); node 3 has no edges
    assert(g.filter(_._1 == 0L).map(_._3).toList == List(1L, 2L))
    assert(g.filter(_._1 == 1L).head._3 == 2L || g.filter(_._1 == 1L).head._3 == 0L)
    assert(!g.exists(_._1 == 3L))
    // every non-singleton node has exactly min(k, cellmates) edges
    assert(g.count(_._1 == 2L) == 2)
  }

  test("streaming continuous ingest: foreachBatch probes + appends the minhash index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    val path = tmpDir("graft-mh-stream").resolve("idx").toString
    val seed = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("shingles"))
    Dedup.writeMinhashIndex(seed, "doc_id", "shingles", path,
      numHashes = 64, numBands = 32)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val dupsFound = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // per micro-batch: probe the persisted index, record near-dups,
    // append only the novel docs — the index IS the streaming state,
    // shared across restarts and across batch/streaming jobs
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sh = batch.select(col("doc_id"),
          Dedup.textShingles(col("text"), 3).as("shingles"))
        val pairs = Dedup.probeMinhashIndex(batch.sparkSession, path, sh,
          "doc_id", "shingles", threshold = 0.6)
        dupsFound ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
        val dupIds = pairs.select("batch_id").distinct()
        Dedup.appendToMinhashIndex(
          sh.join(dupIds, sh("doc_id") === dupIds("batch_id"), "left_anti"),
          "doc_id", "shingles", path)
        ()
      }.start()
    try {
      // batch 1: one near-dup of seed doc 0, one novel doc
      stream.addData((100L, "alpha beta gamma delta epsilon zeta eta iota"),
        (101L, "completely novel streaming content goes right here"))
      q.processAllAvailable()
      // batch 2: a near-dup of the doc APPENDED in batch 1
      stream.addData((200L, "completely novel streaming content goes right there"))
      q.processAllAvailable()
    } finally q.stop()
    assert(dupsFound.toSet == Set((100L, 0L), (200L, 101L)))
  }

  test("randomProject: exact scaled-sign sums, hand-checked") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 1.0f, 0.0f))).toDF("id", "v")
    val out = df.select(Similarity.randomProject(col("v"), 4, 2, scale = 100.0))
      .collect()(0).getSeq[Long](0)
    val s = Seq(50L, -25L, 100L, 0L)
    val expected = (0 until 2).map { j =>
      (0 until 4).map { d =>
        // SRHT: random-diagonal LCG sign × Walsh-Hadamard row parity
        val lcg = if ((1103515245L * d + 12345L) % 2001L >= 1000L) 1L else -1L
        val had = if (Integer.bitCount(j & d) % 2 == 0) 1L else -1L
        s(d) * lcg * had
      }.sum
    }
    assert(out == expected)
  }

  test("randomProject: planted clusters keep their neighborhoods (JL property)") {
    // 5 well-separated 64-dim centers, 20 points each with tiny jitter;
    // a 16-dim sign projection must keep same-cluster points nearest
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(5)(Array.fill(64)(rnd.nextGaussian()))
    val pts = for (c <- 0 until 5; k <- 0 until 20) yield
      (c * 100L + k,
        centers(c).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat).toSeq)
    val df = pts.toDF("vec_id", "embedding")
    val proj = df.select(col("vec_id"),
      Similarity.randomProject(col("embedding"), 64, 16).as("p"))
    val q = proj.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("p").as("qp"))
    val pairs = proj.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        aggregate(zip_with(col("p"), col("qp"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"))
    val top = Similarity.topKPerGroup(pairs, Seq(col("qid")),
        Seq(col("dist"), col("vec_id")), 5)
      .select(col("qid"), col("vec_id")).collect()
    // every query's projected top-5 is entirely same-cluster
    top.foreach { r =>
      assert(r.getLong(0) / 100 == r.getLong(1) / 100,
        s"cross-cluster neighbor in projected top-5: $r")
    }
    assert(top.length == 25)
  }

  test("randomProject: mean squared coordinate tracks true distance (unbiased-ish)") {
    // E[(p_a - p_b)_j^2] = scale^2 |a-b|^2 for +-1 signs; sample ratio
    // stays within a loose constant for random pairs
    val rnd = new scala.util.Random(7)
    val a = Array.fill(64)(rnd.nextGaussian()); val b = Array.fill(64)(rnd.nextGaussian())
    val df = Seq((1L, a.map(_.toFloat).toSeq), (2L, b.map(_.toFloat).toSeq))
      .toDF("id", "v")
    val p = df.orderBy("id")
      .select(Similarity.randomProject(col("v"), 64, 16))
      .collect().map(_.getSeq[Long](0))
    val meanSq = p(0).zip(p(1)).map { case (x, y) =>
      val d = x - y; d.toDouble * d }.sum / 16
    val trueSq = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum * 1e12
    val ratio = meanSq / trueSq
    assert(ratio > 0.2 && ratio < 5.0, s"distortion ratio $ratio")
  }

  test("randomProject: a vector shorter than dim raises, never zero-pads") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    intercept[Exception] {
      df.select(Similarity.randomProject(col("v"), 64, 4)).collect()
    }
  }
}
