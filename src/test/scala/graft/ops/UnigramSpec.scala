package graft.ops

import graft.SparkSpec
import graft.functions.UnigramSegment
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer specs: the DP segmentation contract (min
  * integer cost, longest-piece tie-break, unreachable pass-through),
  * hard-EM learning behavior on planted structure, determinism, and
  * the pruning/coverage invariants. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("kernel: min-cost split, longest-piece tie-break, unreachable word atomic") {
    val model = Seq(("a", 10L), ("b", 10L), ("ab", 20L), ("abc", 15L), ("c", 50L))
    def seg(w: String): Seq[String] =
      Seq(w).toDF("w").select(UnigramSegment.segment(col("w"), model).as("p"))
        .collect()(0).getSeq[String](0)
    // exact tie [a,b]=20 vs [ab]=20 -> the longer piece wins
    assert(seg("ab") == Seq("ab"))
    // abc: [abc]=15 beats [ab,c]=70 and [a,b,c]=70
    assert(seg("abc") == Seq("abc"))
    // abab: [ab,ab]=40 (vs [a,b,ab]=40 ties resolved left-to-right on
    // the backward chain: position 4 prefers ab, then position 2 too)
    assert(seg("abab") == Seq("ab", "ab"))
    // out-of-alphabet character -> whole word atomic
    assert(seg("axb") == Seq("axb"))
    // empty-safe
    assert(seg("a") == Seq("a"))
  }

  test("learn: frequent word becomes one piece; coverage floor; prune bound; determinism") {
    // "the" dominates; rare words keep the alphabet honest
    val docs = (0 until 40).map(i => (i.toLong, "the cat sat on the mat the"))
      .toDF("doc_id", "text")
    val model = Unigram.learn(docs, "text", vocabSize = 30, seedMulti = 40)
    val pieces = model.map(_.piece).toSet
    assert(pieces.contains("the"), s"'the' missing from $pieces")
    // the alphabet of the learnable corpus survives pruning (coverage)
    val alphabet = "thecasonm".toSet.map((c: Char) => c.toString)
    assert(alphabet.subsetOf(pieces), s"alphabet missing from $pieces")
    // prune bound: |vocab| <= max(|alphabet|, vocabSize)
    assert(model.size <= math.max(alphabet.size, 30))
    // deterministic under partitioning and re-runs
    val again = Unigram.learn(docs.repartition(7), "text",
      vocabSize = 30, seedMulti = 40)
    assert(again == model)
    // encoding uses the learned pieces: the dominant word is one piece
    val enc = Unigram.encodePieces(
      Seq((1L, "the cat"), (2L, null.asInstanceOf[String]), (3L, ""))
        .toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(enc(1L).head == "the", s"${enc(1L)}")
    assert(enc(2L) == null && enc(3L) == Seq.empty)
    // a learnable-looking word with an out-of-corpus char stays atomic
    val q = Unigram.encodePieces(Seq((9L, "zzz")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect()(0).getSeq[String](1)
    assert(q == Seq("zzz"))
  }

  test("hard-EM reallocates mass: counts after round 2 reflect Viterbi usage, not raw substrings") {
    val docs = (0 until 20).map(i => (i.toLong, "inter inter inter net"))
      .toDF("doc_id", "text")
    val model = Unigram.learn(docs, "text", vocabSize = 20, seedMulti = 30)
    val m = model.map(p => p.piece -> p.count).toMap
    // "inter" is segmented as ONE piece, so its Viterbi count equals
    // the word frequency (3 occurrences x 20 docs)...
    assert(m.get("inter").contains(60L), s"$m")
    // ...and its characters' Viterbi counts exclude those uses ("n",
    // "e", "t" only surface through "net" if even that fused)
    assert(m("i") == 0L, s"$m")
    // overflow contract: a poisoned count raises before the arithmetic
    intercept[IllegalArgumentException] {
      Unigram.costsOf(Seq(("a", Long.MaxValue / 2)), maxWordLen = 16)
    }
    // parameter validation
    intercept[IllegalArgumentException] {
      Unigram.learn(docs, "text", vocabSize = 0)
    }
  }
}
