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

  test("learnTable exposes the artifact schema") {
    val t = Bpe.learnTable(spark, corpus, "text", numMerges = 2)
    assert(t.columns.toSeq == Seq("merge_rank", "left_sym", "right_sym", "pair_count"))
    assert(t.count() == 2L)
  }
}
