package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted JL-projected candidate index ([[Similarity.writeJlIndex]] /
  * [[Similarity.jlTopKIndexed]]) — the s18 gate's machinery. */
class JlIndexSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed * 7919 + 13)
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
  }

  /** 200 base vectors; ids 150..154 are EXACT copies of queries 0..4. */
  private lazy val corpus = {
    val rows = (0 until 200).map { i =>
      val v = if (i >= 150 && i < 155) vec(i - 150) else vec(i)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("exact copy is rank 1 through the index (same bucket, jdist 0, cosine 1)") {
    val path = tmpDir("jl-idx").resolve("idx").toString
    Similarity.writeJlIndex(corpus, "vec_id", "embedding", path,
      dim = dim, outDim = 16, bucketBits = 4)
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Similarity.jlTopKIndexed(spark, path, queries, "vec_id",
        "embedding", k = 3, candidates = 16)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (q <- 0L until 5L) assert(got(q) == q + 150L, s"query $q top-1 ${got(q)}")
  }

  test("recall vs brute force is real (two-stage candidates are not degenerate)") {
    val path = tmpDir("jl-idx-r").resolve("idx").toString
    Similarity.writeJlIndex(corpus, "vec_id", "embedding", path,
      dim = dim, outDim = 16, bucketBits = 4)
    val queries = corpus.filter(col("vec_id") < 10)
    val approx = Similarity.jlTopKIndexed(spark, path, queries, "vec_id",
        "embedding", k = 5, candidates = 32)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id",
        "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    // measured on this fixture: random 64-d vectors are a WORST case for
    // 16-dim projection + 5/16 multi-probe; assert the floor that holds
    assert(recall >= 0.4, s"recall@5 $recall")
    assert(approx.size == exact.size) // full k returned per query
  }

  test("append == rebuild: batch appended with the index's stored params serves identically") {
    val p1 = tmpDir("jl-idx-a").resolve("idx").toString
    val p2 = tmpDir("jl-idx-b").resolve("idx").toString
    val first = corpus.filter(col("vec_id") < 120)
    val rest = corpus.filter(col("vec_id") >= 120)
    Similarity.writeJlIndex(first, "vec_id", "embedding", p1,
      dim = dim, outDim = 16, bucketBits = 4)
    Similarity.appendToJlIndex(rest, "vec_id", "embedding", p1)
    Similarity.writeJlIndex(corpus, "vec_id", "embedding", p2,
      dim = dim, outDim = 16, bucketBits = 4)
    val queries = corpus.filter(col("vec_id") < 8)
    def serve(p: String) = Similarity.jlTopKIndexed(spark, p, queries,
        "vec_id", "embedding", k = 4, candidates = 16)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(serve(p1) == serve(p2))
  }

  test("an index without _meta raises typed (never probed under guessed parameters)") {
    val dir = tmpDir("jl-nometa")
    // a plain parquet directory that is NOT a JL index
    corpus.limit(5).write.parquet(dir.resolve("idx").toString)
    val e = intercept[IllegalStateException] {
      Similarity.readJlMeta(spark, dir.resolve("idx").toString)
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("projection-kind sentinel: pre-SRHT or foreign sign spaces raise typed") {
    import spark.implicits._
    // a sidecar WITHOUT proj_kind = an index whose p/jbucket were
    // computed in a different (pre-versioning) sign space
    val legacy = tmpDir("jl-legacy").resolve("idx")
    corpus.limit(5).write.parquet(legacy.toString)
    Seq((64, 16, 1e6, 4)).toDF("dim", "out_dim", "scale", "bucket_bits")
      .write.parquet(legacy.resolve("_meta").toString)
    val e = intercept[IllegalStateException] {
      Similarity.readJlMeta(spark, legacy.toString)
    }
    assert(e.getMessage.contains("projection-kind") && e.getMessage.contains("rebuild"))
    // a sidecar with a DIFFERENT kind
    val foreign = tmpDir("jl-foreign").resolve("idx")
    corpus.limit(5).write.parquet(foreign.toString)
    Seq((64, 16, 1e6, 4, "lcgflat0"))
      .toDF("dim", "out_dim", "scale", "bucket_bits", "proj_kind")
      .write.parquet(foreign.resolve("_meta").toString)
    val e2 = intercept[IllegalStateException] {
      Similarity.readJlMeta(spark, foreign.toString)
    }
    assert(e2.getMessage.contains("lcgflat0") && e2.getMessage.contains("rebuild"))
    // the real thing reads back clean
    val good = tmpDir("jl-kind-ok").resolve("idx").toString
    Similarity.writeJlIndex(corpus.limit(20), "vec_id", "embedding", good,
      dim = dim, outDim = 16)
    assert(Similarity.readJlMeta(spark, good) ==
      Similarity.JlMeta(64, 16, 1e6, 4))
  }

  test("null vectors raise typed at write AND append (never bucket-0 null rows)") {
    val withNull = corpus.limit(3).select(col("vec_id"),
      when(col("vec_id") === 1L, lit(null).cast("array<float>"))
        .otherwise(col("embedding")).as("embedding"))
    val e = intercept[Exception] {
      Similarity.writeJlIndex(withNull, "vec_id", "embedding",
        tmpDir("jl-null").resolve("idx").toString, dim = dim, outDim = 16)
    }
    def msgChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgChain(e).exists(_.contains("null vector")), msgChain(e))
    val good = tmpDir("jl-null-b").resolve("idx").toString
    Similarity.writeJlIndex(corpus.limit(20), "vec_id", "embedding", good,
      dim = dim, outDim = 16)
    val e2 = intercept[Exception] {
      Similarity.appendToJlIndex(withNull, "vec_id", "embedding", good)
    }
    assert(msgChain(e2).exists(_.contains("null vector")), msgChain(e2))
  }

  test("duplicate and null query ids raise typed (never a mixed rank list / silent drop)") {
    val path = tmpDir("jl-qid").resolve("idx").toString
    Similarity.writeJlIndex(corpus, "vec_id", "embedding", path,
      dim = dim, outDim = 16)
    def msgChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    val dupQ = corpus.filter(col("vec_id") < 2)
      .unionByName(corpus.filter(col("vec_id") === 1))
    val e = intercept[Exception] {
      Similarity.jlTopKIndexed(spark, path, dupQ, "vec_id", "embedding", k = 2).count()
    }
    assert(msgChain(e).exists(_.contains("duplicate or null query id")), msgChain(e))
    val nullQ = corpus.limit(1).select(lit(null).cast("bigint").as("vec_id"),
      col("embedding"))
    val e2 = intercept[Exception] {
      Similarity.jlTopKIndexed(spark, path, nullQ, "vec_id", "embedding", k = 2).count()
    }
    assert(msgChain(e2).exists(_.contains("duplicate or null query id")), msgChain(e2))
  }

  test("compactJlIndex: multi-append probe identical, one file per bucket, replay rows collapse, crash heal") {
    import java.nio.file.{Files, Paths}
    val path = tmpDir("jl-compact").resolve("idx").toString
    Similarity.writeJlIndex(corpus.filter(col("vec_id") < 100), "vec_id",
      "embedding", path, dim = dim, outDim = 16, bucketBits = 4)
    val b1 = corpus.filter(col("vec_id") >= 100 && col("vec_id") < 140)
    val b2 = corpus.filter(col("vec_id") >= 140 && col("vec_id") < 180)
    Similarity.appendToJlIndex(b1, "vec_id", "embedding", path)
    Similarity.appendToJlIndex(b2, "vec_id", "embedding", path)
    val queries = corpus.filter(col("vec_id") < 8)
    def serve() = Similarity.jlTopKIndexed(spark, path, queries, "vec_id",
        "embedding", k = 4, candidates = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val clean = serve() // the never-duplicated index's answers
    Similarity.appendToJlIndex(b2, "vec_id", "embedding", path) // crash replay
    val rowsBefore = spark.read.parquet(path).count()
    assert(rowsBefore == 220L) // the replay's duplicates are physically there
    Similarity.compactJlIndex(spark, path)
    // compaction must serve exactly the clean index's answers — it also
    // UNDOES the replay's documented candidate-slot recall nick (the
    // duplicated rows each consumed a top-16 slot before folding)
    assert(serve() == clean, "compacted index must serve clean-index results")
    val after = spark.read.parquet(path)
    assert(after.count() == rowsBefore - b2.count(),
      "compaction must collapse the replayed append's duplicate rows")
    assert(after.count() == after.distinct().count())
    // file-count contract: one data file per bucket dir
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("jbucket="))
    assert(bucketDirs.nonEmpty)
    for (d <- bucketDirs) {
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${d.getName}: $n files after compaction")
    }
    // meta params unchanged (memo stays valid by construction)
    assert(Similarity.readJlMeta(spark, path) ==
      Similarity.JlMeta(dim, 16, 1e6, 4))
    // crash window: swap died between delete and rename — probe self-heals
    Files.move(Paths.get(path), Paths.get(path + ".compacting"))
    assert(serve() == clean, "probe must heal the compaction crash window")
    assert(Files.exists(Paths.get(path)))
    // append also heals first (never recreates a bare partial dir)
    Files.move(Paths.get(path), Paths.get(path + ".compacting"))
    Similarity.appendToJlIndex(
      corpus.filter(col("vec_id") >= 180 && col("vec_id") < 190),
      "vec_id", "embedding", path)
    assert(spark.read.parquet(path).count() == 190L)
  }

  test("self-match scope: screen probes match equal-id index rows; the kNN path never ranks self") {
    val path = tmpDir("jl-self").resolve("idx").toString
    Similarity.writeJlIndex(corpus.filter(col("vec_id") < 50), "vec_id",
      "embedding", path, dim = dim, outDim = 16, bucketBits = 4)
    // a crash-after-append REPLAY re-probes ids the index already holds:
    // the screen must reject them as duplicates (cosine 1.0 with their
    // own index row), never re-admit them
    val replay = corpus.filter(col("vec_id") === 7L || col("vec_id") === 9L)
    val matched = Similarity.jlMatchedIds(spark, path, replay, "vec_id",
        "embedding", threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(matched == Set(7L, 9L),
      s"replayed ids must self-match through the screen: $matched")
    // the kNN path's queries ARE corpus members — self must never rank
    val knn = Similarity.jlTopKIndexed(spark, path,
        corpus.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(knn.nonEmpty && knn.forall { case (q, n) => q != n },
      s"kNN returned a self pair: ${knn.filter(p => p._1 == p._2).toSeq}")
  }

  test("contract guards: bucketBits bounds; short vectors raise through the projection") {
    intercept[IllegalArgumentException] {
      Similarity.writeJlIndex(corpus, "vec_id", "embedding", "/tmp/never",
        dim = dim, outDim = 16, bucketBits = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.writeJlIndex(corpus, "vec_id", "embedding", "/tmp/never",
        dim = dim, outDim = 16, bucketBits = 17) // > outDim
    }
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.writeJlIndex(short, "vec_id", "embedding",
        tmpDir("jl-short").resolve("idx").toString, dim = dim, outDim = 16)
    }
    assert(err.getMessage != null)
  }
}
