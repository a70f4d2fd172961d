package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-3 pipeline operators: BM25/TF-IDF ranking,
  * deterministic sampling, PII redaction, incremental dedup. */
class PipelineOps2Spec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "sort sort sort merge join table"),
    (1L, "sort merge"),
    (2L, "table scan filter filter"),
    (3L, "window frame row range row"),
    (4L, "group agg hash table scan join sort")).toDF("doc_id", "text")

  test("bm25: more query-term mass ranks higher; repartition-invariant") {
    val q = Seq("sort", "filter")
    val scores = Ranking.bm25(corpus, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has no query term at all: absent from the result
    assert(!scores.contains(3L))
    // doc 0 (3×sort, short) outranks doc 4 (1×sort, long)
    assert(scores(0L) > scores(4L))
    // decimal aggregation: identical result under different parallelism
    val repart = Ranking.bm25(corpus.repartition(7), "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores == repart)
    // rational-idf variant preserves the same relative order here
    val rational = Ranking.bm25(corpus, "doc_id", "text", q, logIdf = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rational(0L) > rational(4L))
  }

  test("tfIdf: a term present in every doc gets zero weight") {
    val allDocs = Seq((0L, "alpha beta"), (1L, "alpha gamma"), (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val w = Ranking.tfIdf(allDocs, "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getDouble(4)))
    val (common, rare) = w.partition(_._1 == "alpha")
    assert(common.forall(_._2 == 0.0))
    assert(rare.forall(_._2 > 0.0))
  }

  test("bernoulliByHash: deterministic, nested by fraction, ~uniform") {
    val ids = spark.range(2000).toDF("id")
    val s30 = Sampling.bernoulliByHash(ids, col("id"), 0.3).as[Long].collect().toSet
    val s30b = Sampling.bernoulliByHash(ids.repartition(13), col("id"), 0.3)
      .as[Long].collect().toSet
    assert(s30 == s30b) // no RNG: same rows under any partitioning
    val s10 = Sampling.bernoulliByHash(ids, col("id"), 0.1).as[Long].collect().toSet
    assert(s10.subsetOf(s30)) // thresholds nest: smaller fraction ⊆ larger
    assert(s30.size > 450 && s30.size < 750, s"got ${s30.size} of ~600")
    // fraction 1.0 is the identity — no 2^-48 edge drop
    assert(Sampling.bernoulliByHash(ids, col("id"), 1.0).count() == 2000L)
  }

  test("stratifiedByHash: n per stratum, deterministic, two-stage") {
    val df = (0 until 300).map(i => (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val s = Sampling.stratifiedByHash(df, "lang", col("id"), 7)
    val byLang = s.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 7L), s"got $byLang")
    val again = Sampling.stratifiedByHash(df.repartition(11), "lang", col("id"), 7)
    assert(s.select("id").as[Long].collect().sorted.sameElements(
      again.select("id").as[Long].collect().sorted))
    // both arms in one frame (the p17 composition shape): a dominant
    // stratum is capped at n while an under-budget one survives WHOLE —
    // the degenerate all-under-budget case would hide a cap regression
    val skewed = ((0 until 30).map(i => (i.toLong, "big")) ++
      (100 until 105).map(i => (i.toLong, "small"))).toDF("id", "lang")
    val capped = Sampling.stratifiedByHash(skewed, "lang", col("id"), 20)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("big" -> 20L, "small" -> 5L), s"got $capped")
  }

  test("pii: counts find planted classes; redact replaces in order") {
    val df = Seq(
      (0L, "mail a.b+c@test-host.org now"),
      (1L, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
      (2L, "nothing to see here 12345")).toDF("doc_id", "text")
    val c = Pii.piiCounts(df).orderBy("doc_id")
      .select("n_email", "n_ssn", "n_phone", "n_ipv4")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(c(0) == ((1, 0, 0, 0)))
    assert(c(1) == ((0, 1, 1, 1)))
    assert(c(2) == ((0, 0, 0, 0)))
    val red = df.select(Pii.redact(col("text"))).orderBy(lit(1)).as[String].collect()
    assert(red.exists(_.contains("[EMAIL]")))
    val r1 = df.filter(col("doc_id") === 1).select(Pii.redact(col("text"))).as[String].head()
    assert(r1 == "ssn [SSN] phone [PHONE] ip [IP]", r1)
    val r2 = df.filter(col("doc_id") === 2).select(Pii.redact(col("text"))).as[String].head()
    assert(r2 == "nothing to see here 12345") // untouched
  }

  test("bestPerCluster: highest-score member survives, singletons untouched") {
    val df = Seq(
      (0L, "short", 5),
      (1L, "the long canonical copy", 23), // cluster {0,1,2}: 1 wins on score
      (2L, "mid copy", 8),
      (3L, "lonely doc", 10),              // no pair: survives
      (4L, "tie a", 7), (5L, "tie b", 7))  // cluster {4,5}: tie → min id 4
      .toDF("id", "txt", "q")
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.bestPerCluster(df, "id", "q", pairs)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L))
  }

  test("bigramPlausibility: repeated transitions score higher; repartition-invariant") {
    val df = Seq(
      (0L, "a b a b a b"),   // only transitions the corpus has seen a lot
      (1L, "a b z q"),       // two singleton transitions
      (2L, "x"))             // <2 tokens → absent
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramPlausibility(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(!r.contains(2L))
    assert(r(0L)._1 == 5L && r(1L)._1 == 3L)
    assert(r(0L)._2 > r(1L)._2)
    val rep = TextAnalysis.bigramPlausibility(df.repartition(5), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r == rep) // decimal sums: parallelism-independent
  }

  test("collocations: hand-computed lift, minCount floor, repartition-invariant") {
    val df = Seq((0L, "a b a b"), (1L, "c c c c")).toDF("doc_id", "text")
    // Nu=8 Nb=6; c(a)=c(b)=2, c(c)=4; c12: (a,b)=2 (b,a)=1 (c,c)=3
    val r = TextAnalysis.collocations(df, "text", minCount = 1L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(r === Map(
      ("a", "b") -> (2L, math.round(2.0 * 8 * 8 * 1e6 / (6.0 * 2 * 2))),
      ("b", "a") -> (1L, math.round(1.0 * 8 * 8 * 1e6 / (6.0 * 2 * 2))),
      ("c", "c") -> (3L, math.round(3.0 * 8 * 8 * 1e6 / (6.0 * 4 * 4)))))
    // the floor drops singleton bigrams
    val floored = TextAnalysis.collocations(df, "text", minCount = 2L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(floored === Set(("a", "b"), ("c", "c")))
    val rep = TextAnalysis.collocations(df.repartition(5), "text", minCount = 1L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(r === rep)
  }

  test("incrementalExact: corpus dups dropped, in-batch dup keeps min id") {
    val corpus = Seq((0L, "old news"), (1L, "stale copy")).toDF("id", "txt")
    val batch = Seq(
      (10L, "fresh content"),
      (11L, "stale copy"),     // already in corpus → dropped
      (12L, "brand new"),
      (13L, "brand new"))      // in-batch dup → min id 12 survives
      .toDF("id", "txt")
    val out = Dedup.incrementalExact(batch, corpus, "txt", "id")
      .select("id").as[Long].collect().toSet
    assert(out == Set(10L, 12L))
    // digest-index corpus (the 100 TB ingest shape): same answer when the
    // corpus side is pre-digested md5 hex instead of raw text
    val digestIndex = corpus.select(md5(col("txt").cast("binary")).as("txt"))
    val out2 = Dedup.incrementalExact(batch, digestIndex, "txt", "id",
        corpusIsDigest = true)
      .select("id").as[Long].collect().toSet
    assert(out2 == Set(10L, 12L))
  }
}
