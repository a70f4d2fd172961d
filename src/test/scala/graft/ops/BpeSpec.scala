package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning + subword encoding: the classic Sennrich worked
  * example hand-checked end-to-end, greedy left-to-right overlap
  * semantics, atomic pass-through of non-learnable tokens, partitioning
  * invariance, and early exhaustion. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // word frequencies: low×5 lower×2 newest×6 widest×3 (the textbook corpus)
  private lazy val corpus = Seq(
    (0L, "low low low low low lower lower"),
    (1L, "newest newest newest newest newest newest"),
    (2L, "widest widest widest")).toDF("doc_id", "text")

  test("learn reproduces the textbook merge sequence with deterministic ties") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    // pair counts: (e,s)=9 ties (s,t)=9 → lex picks (e,s); then (es,t)=9;
    // then (l,o)=7 ties (o,w)=7 → lex picks (l,o); then (lo,w)=7
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("learn is invariant to input partitioning") {
    val a = Bpe.learn(corpus.repartition(1), "text", numMerges = 4)
    val b = Bpe.learn(corpus.repartition(7), "text", numMerges = 4)
    assert(a == b)
  }

  test("encode folds merges in rank order; unseen and non-ascii tokens pass through") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    // "lowest" is NOT in the training corpus but segments low+est via the
    // learned chain; digits and mixed tokens stay atomic; tokenization
    // lowercases first
    val out = Bpe.encode(
      Seq((0L, "Lowest widest 42 x9"), (1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(0L) == Seq("low", "est", "w", "i", "d", "est", "42", "x9"))
    assert(out(1L) == Seq.empty)
  }

  test("runs of the same pair all merge in one pass (Sennrich semantics)") {
    val d = Seq((0L, "aa aa aaa")).toDF("doc_id", "text")
    // dict: aa×2 (1 pair each), aaa×1 (2 pairs) → (a,a)=4; aaa merges
    // left-to-right to [aa, a] → (aa,a)=1
    val merges = Bpe.learn(d, "text", numMerges = 2)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("a", "a", 4L), ("aa", "a", 1L)))
    val enc = Bpe.encode(Seq((0L, "aaaa aaa")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().head.getSeq[String](1)
    // "aaaa": (a,a) merges BOTH adjacent occurrences in one pass —
    // [aa, aa] like Sennrich's lookaround regex, not [aa, a, a]; then
    // (aa,a) finds no " aa  a ". "aaa": [aa, a] then [aaa].
    assert(enc == Seq("aa", "aa", "aaa"))
  }

  test("learn stops early when every word is fully fused") {
    val d = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.learn(d, "text", numMerges = 10)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) == Seq(("a", "b", 2L)))
  }

  test("vocab ids: letters 1-26, merge outputs 26+rank, collisions keep lowest id") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    val v = Bpe.vocab(spark, merges).collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    assert(v("a") == 1 && v("z") == 26)
    assert(v("es") == 27 && v("est") == 28 && v("lo") == 29 && v("low") == 30)
    // a crafted collision: merge output equal to an existing letter is
    // impossible (outputs have length >= 2), but two merges CAN emit the
    // same string — lowest id must win
    val dup = Seq(Bpe.Merge(1, "a", "bc", 1L), Bpe.Merge(2, "ab", "c", 1L))
    val vd = Bpe.vocab(spark, dup).filter("symbol = 'abc'").collect()
    assert(vd.length == 1 && vd.head.getInt(0) == 27)
  }

  test("encodeToIds: subword ids in order, unknown tokens 0, empty doc empty") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    val out = Bpe.encodeToIds(
      Seq((0L, "lowest 42 newest"), (1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // lowest → [low, est] → [30, 28]; 42 → [0]; newest → n e w est →
    // [14, 5, 23, 28]
    assert(out(0L) == Seq(30, 28, 0, 14, 5, 23, 28))
    assert(out(1L) == Seq.empty)
  }

  test("encodeViaDict == encode on a mixed corpus (broadcast and shuffle join)") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    val mixed = Seq(
      (0L, "Lowest widest 42 x9 newest"),
      (1L, ""),
      (2L, "aaaa low low aaaa"),             // repeated words + runs
      (3L, "  spaced   out\ttabs "),         // whitespace shapes
      (4L, null.asInstanceOf[String]))       // null text
      .toDF("doc_id", "text")
    val viaFold = Bpe.encode(mixed, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for (bcast <- Seq(true, false)) {
      val viaDict = Bpe.encodeViaDict(mixed, "doc_id", "text", merges, broadcastDict = bcast)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(viaDict == viaFold, s"broadcastDict=$bcast")
    }
  }

  test("fertilityReport: counts match encodeViaDict, tokenless docs omitted, dup ids raise") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    val mixed = Seq(
      (0L, "Lowest widest 42 x9 newest"),
      (1L, ""),                               // no tokens -> omitted
      (2L, "aaaa low low aaaa"),
      (4L, null.asInstanceOf[String]))        // null text -> omitted
      .toDF("doc_id", "text")
    val rep = Bpe.fertilityReport(mixed, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rep.keySet === Set(0L, 2L))
    // cross-check against the encode path + raw token stats
    val enc = Bpe.encodeViaDict(mixed.filter(col("doc_id").isin(0L, 2L)),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, (nw, nc, ns, fert, cps)) <- rep) {
      val toks = mixed.filter(col("doc_id") === id)
        .select(explode(TextAnalysis.tokens(col("text")))).as[String].collect()
      assert(nw === toks.length.toLong, s"doc $id n_words")
      assert(nc === toks.map(_.length.toLong).sum, s"doc $id n_chars")
      assert(ns === enc(id).length.toLong, s"doc $id n_subwords")
      assert(fert === ns * 100L / nw && cps === nc * 100L / ns, s"doc $id ratios")
    }
    val dup = mixed.unionByName(mixed.filter(col("doc_id") === 2L))
    val err = intercept[Exception] {
      Bpe.fertilityReport(dup, "doc_id", "text", merges).collect()
    }
    assert(err.getMessage.contains("duplicate") ||
      err.getCause != null && err.getCause.getMessage.contains("duplicate"))
  }

  test("encodeViaDict handles a production-sized merge chain (512 merges)") {
    // a deep synthetic chain over {a,b}: the literal-replace fold at this
    // depth is a 512-deep nested expression (codegen fallback territory);
    // the dict path's kernel is a loop — this pins that it RUNS and that
    // rank order is respected (a*32 folds through successive doublings)
    val chain = scala.collection.mutable.ArrayBuffer[Bpe.Merge]()
    var sym = "a"
    var rank = 1
    while (rank <= 5) { chain += Bpe.Merge(rank, sym, sym, 1L); sym = sym + sym; rank += 1 }
    // pad with merges that never fire (distinct pairs over unused symbols)
    val pad = (6 to 512).map(r => Bpe.Merge(r, "q" + r, "z", 1L))
    val merges = chain.toSeq ++ pad
    val out = Bpe.encodeViaDict(
      Seq((0L, ("a" * 32) + " " + ("a" * 3))).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().head.getSeq[String](1)
    assert(out == Seq("a" * 32, "aa", "a"))
  }

  test("encodeViaDict raises a typed error on duplicate ids instead of interleaving docs") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    // duplicate ids with different texts, identical texts, and null texts
    for (dup <- Seq(
      Seq((7L, "low low"), (7L, "widest"), (8L, "newest")),
      Seq((7L, "low"), (7L, "low")),
      Seq((7L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String])))) {
      val e = intercept[Exception](
        Bpe.encodeViaDict(dup.toDF("doc_id", "text"), "doc_id", "text", merges).collect())
      assert(e.getMessage.contains("duplicate rows") ||
        Option(e.getCause).exists(_.getMessage.contains("duplicate rows")),
        s"expected the duplicate-id error, got: ${e.getMessage}")
    }
    // the per-row path handles the same corpus fine
    assert(Bpe.encode(Seq((7L, "low low"), (7L, "widest")).toDF("doc_id", "text"),
      "doc_id", "text", merges).count() == 2)
  }

  test("encodeToIds routes through the dict path unchanged") {
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    val out = Bpe.encodeToIds(
      Seq((0L, "lowest 42 newest"), (1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(0L) == Seq(30, 28, 0, 14, 5, 23, 28))
    assert(out(1L) == Seq.empty)
  }

  test("learnTable exposes the artifact schema and round-trips through parquet") {
    val t = Bpe.learnTable(spark, corpus, "text", numMerges = 2)
    assert(t.columns.toSeq == Seq("merge_rank", "left_sym", "right_sym", "pair_count"))
    assert(t.count() == 2L)
    val path = tmpDir("bpe-merges").resolve("m").toString
    t.write.parquet(path)
    val back = Bpe.mergesFrom(spark.read.parquet(path))
    assert(back == Bpe.learn(corpus, "text", numMerges = 2))
  }
}
