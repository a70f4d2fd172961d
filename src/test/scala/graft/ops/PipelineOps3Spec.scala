package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-3 additions: context-window chunking, domain
  * mixture sampling, dedup normalization, corpus composition. */
class PipelineOps3Spec extends SparkSpec {

  import spark.implicits._

  test("chunkByTokens: window/stride coverage, clipped tails, empty docs") {
    val docs = Seq(
      (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (1L, "a b"),                            // shorter than window
      (2L, "   "),                            // no tokens: no chunks
      (3L, "x")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    // doc 0: starts 0,3,6,9 — last two clipped
    assert(out.filter(_._1 == 0L).toSeq == Seq(
      (0L, 0, 4, "t0 t1 t2 t3"),
      (0L, 1, 4, "t3 t4 t5 t6"),
      (0L, 2, 4, "t6 t7 t8 t9"),
      (0L, 3, 1, "t9")))
    // short doc: exactly one partial chunk; whitespace-only doc: none
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0, 2, "a b")))
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 1, "x")))
    // stride == window: disjoint cover, every token exactly once
    val disjoint = Chunking.chunkByTokens(docs, "doc_id", "text", window = 3, stride = 3)
      .filter(col("doc_id") === 0L).agg(sum("n_tokens")).head().getLong(0)
    assert(disjoint == 10L)
    // chunk boundaries are a pure function of the text: partitioning-invariant
    val repart = Chunking.chunkByTokens(docs.repartition(7), "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    assert(repart.toSeq == out.toSeq)
  }

  test("mixtureByHash: per-domain fractions, exact 0/1 edges, nesting") {
    val rows = (0L until 3000L).map(i => (i, s"dom${i % 3}")).toDF("id", "domain")
    val kept = Sampling.mixtureByHash(rows, "domain", col("id"),
        Map("dom0" -> 1.0, "dom1" -> 0.0), defaultFraction = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // fraction 1.0 keeps EVERY row (the "g" threshold sorts after any
    // hex digest); fraction 0.0 keeps none
    assert(kept.count(_._2 == "dom0") == 1000)
    assert(kept.count(_._2 == "dom1") == 0)
    // the default-fraction domain matches the plain Bernoulli sample of
    // the same rows — per-domain thresholds nest into the global ones
    val dom2 = kept.filter(_._2 == "dom2").map(_._1).toSet
    val bern = Sampling.bernoulliByHash(
        rows.filter(col("domain") === "dom2"), col("id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(dom2 == bern)
    // partitioning-invariant
    val repart = Sampling.mixtureByHash(rows.repartition(13), "domain", col("id"),
        Map("dom0" -> 1.0, "dom1" -> 0.0), defaultFraction = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(repart == kept.toSet)
  }

  test("normalizeForDedup: case, punctuation and whitespace variants collapse") {
    val df = Seq(
      (0L, "Hello, World!"),
      (1L, "  hello   world  "),
      (2L, "HELLO WORLD"),
      (3L, "hello-world"),
      (4L, "different text")).toDF("id", "text")
    val groups = Dedup.exactGroupsByHash(
        df.select(col("id"), TextAnalysis.normalizeForDedup(col("text")).as("n")),
        "n", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(groups.toSeq == Seq((0L, 4L), (4L, 1L)))
  }

  test("splitByHash: total partition, weights honored, group-keyed leakage safety") {
    val rows = (0L until 5000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Sampling.splitByHash(rows, col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // every row gets exactly one label; proportions are near the weights
    assert(labeled.length == 5000)
    val byLabel = labeled.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 3800 && byLabel("train") < 4200)
    assert(byLabel("val") > 350 && byLabel("val") < 650)
    // deterministic under repartitioning
    val again = Sampling.splitByHash(rows.repartition(11), col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labeled.toMap == again)
    // leakage safety: keying on a GROUP id sends every member of the
    // group to the same split
    val grouped = Seq((0L, 100L), (1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L))
      .toDF("id", "canonical_id")
    val g = Sampling.splitByHash(grouped, col("canonical_id"), splits)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(g.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1))
    // invalid weights rejected loudly
    intercept[IllegalArgumentException](
      Sampling.splitByHash(rows, col("id"), Seq("a" -> 0.5, "b" -> 0.3)))
  }

  test("packGreedy: running-total bins, rollover offsets, shard independence") {
    // one shard: tokens 100, 100, 100 with budget 256 — third sequence
    // starts at offset 200 in bin 0 and rolls over into bin 1
    val chunks = Seq(
      ("s0", 0L, 0, 100), ("s0", 0L, 1, 100), ("s0", 1L, 0, 100), ("s0", 1L, 1, 60),
      ("s1", 2L, 0, 300)).toDF("shard", "doc_id", "chunk_idx", "n_tokens")
    val packed = Chunking.packGreedy(chunks, col("shard"), col("n_tokens"),
        budget = 256, Seq(col("doc_id"), col("chunk_idx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getInt(4), r.getInt(5)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    // (shard, doc, chunk, bin_id, bin_offset)
    assert(packed == Seq(
      ("s0", 0L, 0, 0, 0), ("s0", 0L, 1, 0, 100),
      ("s0", 1L, 0, 0, 200),      // starts in bin 0, rolls over
      ("s0", 1L, 1, 1, 44),       // starts at global offset 300 = bin 1 + 44
      ("s1", 2L, 0, 0, 0)))       // shards pack independently
    // partitioning-invariant
    val again = Chunking.packGreedy(chunks.repartition(5), col("shard"),
        col("n_tokens"), 256, Seq(col("doc_id"), col("chunk_idx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getInt(4), r.getInt(5))).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(again == packed)
  }

  test("corpusComposition: exact counts, shares sum to 1, cumulative order") {
    val docs = Seq(
      (0L, "a b c", "web"), (1L, "d e", "web"),
      (2L, "f g h i", "books"), (3L, "j", "code"))
      .toDF("doc_id", "text", "source")
    val rows = TextAnalysis.corpusComposition(docs, "source")
      .orderBy(col("n_tokens").desc, col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("web", 2L, 5L), ("books", 1L, 4L), ("code", 1L, 1L)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    // cumulative share walks largest-first and ends at exactly 1.0
    assert(rows.map(_._5).toSeq == Seq(5.0 / 10, 9.0 / 10, 1.0))
    // one row per domain regardless of input partitioning
    val repart = TextAnalysis.corpusComposition(docs.repartition(7), "source")
      .orderBy(col("n_tokens").desc, col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(repart.toSeq == rows.toSeq)
  }
}
