package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pipeline-operator specs: planted near-duplicates must be found,
  * approximate methods must agree with exact baselines. */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (1L, "pack my box with five dozen liquor jugs for the long trip north"),
      (2L, "sphinx of black quartz judge my vow said the wise old man"),
      (3L, "how vexingly quick daft zebras jump over fences in the summer sun"),
      (4L, "the five boxing wizards jump quickly over the frozen river ice"))
    // near-dups of 0 and 1 (one token appended), exact dup of 2
    val dups = Seq(
      (100L, base(0)._2 + " tonight"),
      (101L, base(1)._2 + " tomorrow"),
      (102L, base(2)._2))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("exact dedup groups: identical text collapses to min id") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
    assert(g.count() == 7) // 8 docs, one exact dup pair
    val dup = g.filter(col("dup_count") === 2).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("canonical_id") == 2L)
    assert(Dedup.exact(docs, "text", "doc_id").count() == 7)
  }

  test("minhash LSH + jaccard finds planted near-dup pairs, skips unrelated") {
    val withShingles = docs.withColumn("shingles",
      Dedup.wordShingles(TextAnalysis.tokens(col("text")), 3))
    val pairs = Dedup.nearDupPairs(withShingles, "doc_id", "shingles", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), s"missing planted pair, got $pairs")
    assert(pairs.contains((1L, 101L)))
    assert(pairs.contains((2L, 102L)))
    assert(!pairs.exists { case (a, b) => a < 100 && b < 100 }) // no false pairs among originals
    val survivors = Dedup.nearDedup(withShingles, "doc_id", "shingles", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("fused textShingles kernel matches the declarative formulation") {
    val declarative = docs.select(col("doc_id"),
      Dedup.wordShingles(TextAnalysis.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fused = docs.select(col("doc_id"), Dedup.textShingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fused == declarative)
  }

  test("transitive closure: a chain of near-dups collapses to one survivor") {
    val chain = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // one component {1,2,3,4}
      (10L, 11L)) // separate component
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("simhash: near-identical docs within small hamming distance") {
    val sh = docs.withColumn("simhash", Dedup.simhash(TextAnalysis.tokens(col("text"))))
    val values = sh.select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(values(2L) == values(102L)) // exact dup → same signature
    val d0 = java.lang.Long.bitCount(values(0L) ^ values(100L))
    val dUnrelated = java.lang.Long.bitCount(values(0L) ^ values(3L))
    assert(d0 < dUnrelated, s"near-dup hamming $d0 should be < unrelated $dUnrelated")
    val pairs = Dedup.simhashPairs(sh, "doc_id", "simhash", maxDistance = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 102L)))
  }

  test("simhashPairs: maxDistance=0 finds exact-signature pairs without cross product") {
    val sh = docs.withColumn("simhash", Dedup.simhash(TextAnalysis.tokens(col("text"))))
    val pairs = Dedup.simhashPairs(sh, "doc_id", "simhash", maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 102L))) // only the exact duplicate
  }

  test("simhashPairs works with non-numeric ids") {
    val df = Seq(("doc-a", 123L), ("doc-b", 123L), ("doc-c", -9999L)).toDF("id", "simhash")
    val pairs = Dedup.simhashPairs(df, "id", "simhash", maxDistance = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("doc-a", "doc-b")))
  }

  test("brute-force cosine top-k is exact and deterministic") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", k = 4)
    val rows = topk.collect()
    assert(rows.length == 12)
    // verify against a driver-side exact computation for query 0
    val all = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q0 = all.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSeq
    val got = rows.filter(_.getLong(0) == 0L).sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(got == expected)
  }

  test("filtered ANN: predicate applies before scoring — all k results qualify") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.filteredTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding",
      col("label") === 1, k = 4)
    val labels = vecs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = out.collect()
    assert(rows.length == 12)
    assert(rows.forall(r => labels(r.getLong(2)) == 1))
    // pre-filter, not post-filter: matches brute force over the qualifying subset
    val expected = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") < 3), vecs.filter(col("label") === 1),
        "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == expected)
  }

  test("int8 quantization: codes in [-127,127], reconstruction within scale/2, zero vector passes") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, if (i == 7) Array.fill(8)(0.0f)
        else Array.tabulate(8)(j => (math.sin(i * 8 + j) * (i + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Similarity.int8Quantize(vecs, "embedding")
    // codes are a genuine array<tinyint> — the 4x-narrower-than-float32
    // candidate rows the docstring promises
    assert(q.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val rows = q.select(col("vec_id"), col("embedding").cast("array<double>"),
      col("codes"), col("q_scale")).collect()
    rows.foreach { r =>
      val orig = r.getSeq[Double](1)
      val codes = r.getSeq[Byte](2)
      val scale = r.getDouble(3)
      assert(codes.forall(c => math.abs(c.toInt) <= 127))
      if (r.getLong(0) == 7L) {
        assert(scale == 0.0 && codes.forall(_ == 0))
      } else {
        orig.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - c * scale) <= scale / 2 + 1e-12)
        }
      }
    }
    // reconstruction helper agrees with codes·scale
    val rec = q.select(col("codes"),
        Similarity.int8Reconstruct(col("codes"), col("q_scale")).as("rec"), col("q_scale"))
      .filter(col("q_scale") > 0).collect()
    rec.foreach { r =>
      val codes = r.getSeq[Byte](0); val recon = r.getSeq[Double](1); val s = r.getDouble(2)
      codes.zip(recon).foreach { case (c, x) => assert(x == c * s) }
    }
  }

  test("int8 quantization: non-finite elements yield zero codes + non-finite scale, not a crash") {
    val vecs = Seq(
      (1L, Array(1.0f, Float.NaN, 2.0f)),
      (2L, Array(Float.PositiveInfinity, 1.0f, 0.0f)),
      (3L, Array(1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.int8Quantize(vecs, "embedding").orderBy("vec_id").collect()
    // malformed rows survive as filterable markers (cf. dotOrNull)
    assert(q(0).getSeq[Byte](2).forall(_ == 0) && q(0).getDouble(3).isNaN)
    assert(q(1).getSeq[Byte](2).forall(_ == 0) && q(1).getDouble(3).isPosInfinity)
    assert(q(2).getSeq[Byte](2).exists(_ != 0) && q(2).getDouble(3) == 2.0 / 127.0)
  }

  test("int8 top-k: quantized ranking close to exact, int dots are exact integers") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val approx = Similarity.int8TopK(
      vecs.filter(col("vec_id") < 5), vecs, "vec_id", "embedding", k = 10)
    val rows = approx.collect()
    assert(rows.length == 50)
    // recall@10 vs exact: int8 at 16 dims keeps most of the ordering.
    // (int8TopK ranks by raw quantized dot, bruteForce by cosine; for
    // unnormalized inputs these legitimately differ — compare against
    // dot-ranked exact top-k on the same vectors)
    val all = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dotv(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val recall = (0L until 5L).map { qid =>
      val qv = all.find(_._1 == qid).get._2
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) => (id, dotv(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val got = rows.filter(_.getLong(0) == qid).map(_.getLong(2)).toSet
      exact.intersect(got).size.toDouble / 10.0
    }.sum / 5.0
    assert(recall >= 0.8, s"int8 recall@10 = $recall")
  }

  test("LSH ANN reaches reasonable recall vs brute force") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 5, dim = 16)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall $recall too low")
  }

  test("IVF ANN: high recall on clustered data, exact within probed cells") {
    // 4 well-separated clusters of 50 vectors each
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 5, nList = 8, nProbe = 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low on clustered data")
  }

  test("IVF+PQ: compressed codes keep cluster precision and candidate recall") {
    // PQ cannot rank within one quantization cell (identical codes tie),
    // so the honest assertions are cluster-level precision and
    // recall@10 of the exact top-1 — the standard PQ evaluation shape
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 1.0).toFloat })
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    val pq = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding", 10,
      nList = 8, nProbe = 3, m = 4, kSub = 16)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every approximate neighbor belongs to the query's true cluster
    assert(pq.forall { case (q, n) => n % 4 == q % 4 },
      s"cross-cluster neighbor leaked: ${pq.filterNot { case (q, n) => n % 4 == q % 4 }.toSeq}")
    // the exact nearest neighbor survives into the PQ top-10 for most queries
    val exactTop1 = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = exactTop1.count { case (q, n) => pq.contains((q, n)) }
    assert(hit >= 3, s"exact top-1 found in PQ top-10 for only $hit/4 queries")
    // the stored representation really is m small ints per vector
    val cb = Similarity.trainPq(vecs, "embedding", m = 4, k = 16)
    val codes = vecs.select(Similarity.pqEncode(
      Similarity.normalize(col("embedding")), cb).as("codes")).head().getSeq[Int](0)
    assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 16))
    assert(cb.codewords.length == 4 && cb.subDim == 4)
  }

  test("IVF partitioned index: scan prunes to probed cells, results match in-memory path") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    val cts = Similarity.trainCentroids(vecs, "embedding", k = 8)
    val idx = tmpDir("ivf-index").resolve("index").toString
    Similarity.writeIvfIndex(vecs, "vec_id", "embedding", idx, cts)
    // self-describing: the probe needs only the path — centroids come
    // from the index's own meta sidecar (and round-trip exactly)
    assert(Similarity.readIvfMeta(spark, idx).map(_.toSeq).toSeq ==
      cts.map(_.toSeq).toSeq)
    val indexed = Similarity.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 3)
    // caller-held centroids still accepted (skips the meta read)
    assert(Similarity.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
        k = 5, centroids = Some(cts), nProbe = 3)
      .collect().map(_.toSeq).toSet == indexed.collect().map(_.toSeq).toSet)
    // identical results to the in-memory cell join with the same quantizer
    val inMem = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", k = 5,
      nProbe = 3, centroids = Some(cts))
    assert(indexed.collect().map(_.toSeq).toSet == inMem.collect().map(_.toSeq).toSet)
    // the parquet scan must prune on the cell partition column
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"expected non-empty partition filters in:\n$plan")
  }

  test("IVF+PQ persisted index: quantizers round-trip, scan prunes, results match in-memory") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    val (cts, cb) = Similarity.trainIvfPq(vecs, "embedding", nList = 8, m = 4, kSub = 16)
    val idx = tmpDir("ivfpq-index").resolve("index").toString
    Similarity.writeIvfPqIndex(vecs, "vec_id", "embedding", idx, cts, cb)
    // quantizers survive the parquet round-trip exactly
    val (cts2, cb2) = Similarity.readIvfPqMeta(spark, idx)
    assert(cts2.map(_.toSeq).toSeq == cts.map(_.toSeq).toSeq)
    assert(cb2.m == cb.m && cb2.k == cb.k && cb2.subDim == cb.subDim)
    assert(cb2.codewords.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.codewords.map(_.map(_.toSeq).toSeq).toSeq)
    // identical results to the in-memory path with the same quantizers
    val indexed = Similarity.ivfPqTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 3)
    val inMem = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding", k = 5,
      nProbe = 3, quantizers = Some((cts, cb)))
    assert(indexed.collect().map(_.toSeq).toSet == inMem.collect().map(_.toSeq).toSet)
    // the parquet scan must prune on the cell partition column
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"expected non-empty partition filters in:\n$plan")
  }

  test("IVF / IVF+PQ index append: new batches are probeable without a rebuild") {
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val mk = (i: Int) => {
      val c = centers(i % 4)
      c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat }
    }
    val base = (0 until 100).map(i => (i.toLong, mk(i))).toDF("vec_id", "embedding")
    // the appended batch contains a PLANTED near-copy of query vector 0
    val planted = (9000L, mk(0).map(x => (x * 1.01f)))
    val batch = ((100 until 140).map(i => (i.toLong, mk(i))) :+ planted)
      .toDF("vec_id", "embedding")
    val queries = base.filter(col("vec_id") < 2)

    val (cts, cb) = Similarity.trainIvfPq(base, "embedding", nList = 8, m = 4, kSub = 16)
    val pq = tmpDir("ivfpq-append").resolve("index").toString
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", pq, cts, cb)
    Similarity.appendToIvfPqIndex(batch, "vec_id", "embedding", pq)
    val pqTop = Similarity.ivfPqTopKIndexed(spark, pq, queries, "vec_id", "embedding",
      k = 3, nProbe = 2).collect()
    // the appended row is encoded into the index and SERVED by the
    // pruned probe path (rank/score guarantees live at full precision —
    // see the IVF exact-rerank assertion below; ADC scores at PQ
    // precision can tie across whole same-cell groups or even favor a
    // better-aligned codeword, so rank-1 is not a PQ invariant)
    assert(pqTop.nonEmpty)
    assert(spark.read.parquet(pq).filter(col("neighbor_id") === 9000L).count() == 1)
    val plantedServed = Similarity.ivfPqTopKIndexed(spark, pq,
        queries.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 200, nProbe = 2).collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(2) == 9000L)
    assert(plantedServed.length == 1, "appended row not served by the probe")
    // appended rows score identically to a from-scratch rebuild with the
    // SAME quantizers (append must not re-train or re-derive anything)
    val rebuilt = tmpDir("ivfpq-rebuild").resolve("index").toString
    Similarity.writeIvfPqIndex(base.unionByName(batch), "vec_id", "embedding",
      rebuilt, cts, cb)
    val rebuiltTop = Similarity.ivfPqTopKIndexed(spark, rebuilt, queries,
      "vec_id", "embedding", k = 3, nProbe = 2).collect()
    assert(pqTop.map(_.toSeq).toSet == rebuiltTop.map(_.toSeq).toSet)

    val ivf = tmpDir("ivf-append").resolve("index").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", ivf, cts)
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", ivf)
    val ivfTop = Similarity.ivfTopKIndexed(spark, ivf, queries, "vec_id", "embedding",
      k = 3, nProbe = 2).collect()
    assert(ivfTop.filter(r => r.getLong(0) == 0L && r.getInt(1) == 1)
      .map(_.getLong(2)).toSeq == Seq(9000L))
  }

  test("indexDriftStats / pqDriftStats: ~flat for in-distribution appends, grows for drifted data") {
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    // a DIFFERENT random draw: directions the quantizers never saw
    val oodCenters = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    def mk(ids: Range, cs: Array[Array[Double]]) = ids.map { i =>
      val c = cs(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
    val base = mk(0 until 200, centers)
    val (cts, cb) = Similarity.trainIvfPq(base, "embedding", nList = 8, m = 4, kSub = 16)

    val ivf = tmpDir("ivf-drift").resolve("index").toString
    Similarity.writeIvfIndex(base, "vec_id", "embedding", ivf, cts)
    def ivfErr(): Double = {
      // sampleOneIn=1: every row scored (tiny index; determinism beats
      // sampling here — the sampled path is the same expression)
      val rows = Similarity.indexDriftStats(spark, ivf, sampleOneIn = 1).collect()
      val n = rows.map(_.getLong(2)).sum
      rows.map(r => r.getDouble(3) * r.getLong(2)).sum / n
    }
    val e0 = ivfErr()
    Similarity.appendToIvfIndex(mk(200 until 400, centers), "vec_id", "embedding", ivf)
    val e1 = ivfErr()
    assert(e1 <= e0 * 1.5 + 0.01, s"in-distribution append moved drift $e0 -> $e1")
    Similarity.appendToIvfIndex(mk(400 until 600, oodCenters), "vec_id", "embedding", ivf)
    val e2 = ivfErr()
    assert(e2 >= e1 * 2, s"OOD append should raise drift: $e1 -> $e2")
    // occupancy column reflects the appends
    assert(Similarity.indexDriftStats(spark, ivf).agg(sum(col("n_rows")))
      .head().getLong(0) == 600L)

    val pq = tmpDir("pq-drift").resolve("index").toString
    Similarity.writeIvfPqIndex(base, "vec_id", "embedding", pq, cts, cb)
    def pqErr(sample: org.apache.spark.sql.DataFrame): Double = {
      val rows = Similarity.pqDriftStats(spark, pq, sample, "vec_id", "embedding").collect()
      val n = rows.map(_.getLong(1)).sum
      rows.map(r => r.getDouble(2) * r.getLong(1)).sum / n
    }
    val inDist = pqErr(mk(600 until 700, centers))
    val ood = pqErr(mk(700 until 800, oodCenters))
    assert(ood >= inDist * 2,
      s"OOD sample should reconstruct worse: in-dist $inDist vs ood $ood")
  }

  test("approximate-ANN rerank is two-stage: partial per-partition top-k before the final rank") {
    // every approximate variant must rank via topKPerQuery — a hot cell
    // would otherwise funnel ALL of a query's candidates into one window
    // task. The partial stage shows up as a window partitioned by
    // (query_id, SPARK_PARTITION_ID()).
    val vecs = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
    val plans = Seq(
      "lsh" -> Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 5, dim = 16),
      "ivf" -> Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 5, nList = 4, nProbe = 2),
      "ivfpq" -> Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding", 5,
        nList = 4, nProbe = 2, m = 4, kSub = 8))
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("SPARK_PARTITION_ID"),
        s"$name rerank lost its partial per-partition top-k stage:\n$plan")
    }
  }

  test("hot cell: one dense cluster holding every candidate still ranks correctly") {
    // 300 of 310 vectors collapse into one IVF cell (the 100 TB
    // boilerplate-cluster shape); the two-stage rerank must still return
    // the exact per-query top-k within the probed cell
    val hot = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(8)(j => (10f + math.sin(i * 7 + j).toFloat * 0.1f)))
    }
    val cold = (300 until 310).map { i =>
      (i.toLong, Array.tabulate(8)(j => (-10f + math.cos(i + j).toFloat * 0.1f)))
    }
    val vecs = (hot ++ cold).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") === 0L)
    val ivf = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", k = 5,
      nList = 2, nProbe = 1)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    // exact answer over the hot cluster, driver-side
    val all = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q0 = all.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = all.filter { case (id, _) => id != 0L && id < 300 }
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    assert(ivf.map(_._1).toSeq == expected)
  }

  test("embedding near-dups: planted scaled copies found (cosine = 1)") {
    val base = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j).toFloat))
    }
    val planted = base.take(5).map { case (id, v) => (id + 1000L, v.map(_ * 1.01f)) }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, "vec_id", "embedding", 0.999, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, i + 1000L)), s"missing planted $i"))
  }

  test("embedding near-dups: maxBucket skew guard drops giant clusters, keeps small pairs") {
    // one giant cluster of 50 exactly-parallel vectors (same direction →
    // same sign bucket) plus one small planted pair elsewhere
    val giant = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(j => (1.0f + j) * (1f + i * 1e-4f))))
    val pairVec = Array.tabulate(8)(j => math.cos(j * 3.7).toFloat)
    val small = Seq((900L, pairVec), (901L, pairVec.map(_ * 1.01f)))
    val df = (giant ++ small).toDF("vec_id", "embedding")
    val guarded = Similarity.embeddingNearDups(df, "vec_id", "embedding", 0.999,
      dim = 8, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.contains((900L, 901L)), s"small pair lost, got $guarded")
    assert(!guarded.exists { case (a, b) => a < 50 && b < 50 },
      "giant-bucket pairs must be dropped by the skew guard")
    // without the guard the giant cluster is quadratic: all C(50,2) pairs
    val unguarded = Similarity.embeddingNearDups(df, "vec_id", "embedding", 0.999, dim = 8)
    assert(unguarded.count() >= 50 * 49 / 2)
    // autoPlanes scales bucket count with corpus size, clamped to [8, 24]
    assert(Similarity.autoPlanes(1000) == 8)
    assert(Similarity.autoPlanes(10L * 1000 * 1000) == 18)
    assert(Similarity.autoPlanes(Long.MaxValue) == 24)
  }

  test("IVF quantizer sample is uniform across partitions (not first-partition biased)") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val rows = (0 until 200).map { i =>
      val c = centers(i / 50) // cluster-contiguous ids: cluster 0 fills the first partitions
      (i.toLong, c.zipWithIndex.map { case (v, j) => (v + math.sin(i * 17 + j) * 0.3).toFloat })
    }
    val vecs = rows.toDF("vec_id", "embedding").repartitionByRange(8, col("vec_id"))
    // sampleN=40 < cluster size 50: a first-partitions .limit() sample would
    // only ever see cluster 0; the hash-ordered draw must span all 4 clusters
    val centroids = Similarity.trainCentroids(vecs, "embedding", k = 8, sampleN = 40)
    def norm(a: Array[Double]) = { val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n) }
    centers.zipWithIndex.foreach { case (c, ci) =>
      val cn = norm(c)
      val best = centroids.map(ct => ct.zip(cn).map { case (x, y) => x * y }.sum).max
      assert(best > 0.9, s"cluster $ci unrepresented in trained centroids (best dot $best)")
    }
  }

  test("exactByHash dedup matches exact dedup on content") {
    val byText = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .as[Long].collect().toSet
    val byHash = Dedup.exactByHash(docs, "text", "doc_id").select("doc_id")
      .as[Long].collect().toSet
    assert(byHash == byText)
    val groupsByText = Dedup.exactGroups(docs, "text", "doc_id")
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSet
    val groupsByHash = Dedup.exactGroupsByHash(docs, "text", "doc_id")
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(groupsByHash == groupsByText)
  }

  test("shingle-min fingerprint: stable under distant edits, distinct across docs") {
    val fps = docs.select(col("doc_id"),
      TextAnalysis.fingerprintShingleMin(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(2L) == fps(102L)) // exact dup
    assert(fps.values.toSet.size > 1)
  }

  test("text analysis: tokens, quality, langid, fingerprints") {
    val df = Seq(
      (1L, "The cat and the dog, in a house!"),
      (2L, "Der Hund und die Katze ist nicht ein Haus und der Baum"),
      (3L, "the THE   The")).toDF("doc_id", "text")
    val t = df.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(t(1L) == 8 && t(3L) == 3)
    val q = TextAnalysis.qualityMetrics(df).filter(col("doc_id") === 1)
      .select("punct_cnt", "stopword_cnt").head()
    assert(q.getInt(0) == 2) // comma + bang
    assert(q.getInt(1) == 5) // the, and, the, in, a
    val langs = TextAnalysis.languageId(df).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(langs(2L) == "de")
    // fingerprint is whitespace/case-insensitive
    val fps = df.select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    val fp3b = Seq((4L, "the the the")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprintMd5(col("text"))).head().getString(0)
    assert(fps(3L) == fp3b)
  }

  test("vocab build + token-id encode: frequency-ranked ids, OOV=0, order kept, empty docs") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "   "), // no tokens
      (4L, "zebra the")
    ).toDF("doc_id", "text")
    // counts: the=4, sat=2, cat/dog/mat/on/zebra=1 → ids by (n desc, token asc):
    // the=1, sat=2, cat=3, dog=4, mat=5 (size 5 cuts on/zebra → OOV)
    val vocab = TextAnalysis.buildVocab(docs, "text", 5)
    val v = vocab.orderBy("id").collect().map(r => (r.getString(0), r.getInt(2)))
    assert(v.toSeq == Seq(("the", 1), ("sat", 2), ("cat", 3), ("dog", 4), ("mat", 5)))
    val enc = TextAnalysis.encodeTokenIds(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect().map(r => r.getSeq[Int](1).toList)
    assert(enc(0) == List(1, 3, 2, 0, 1, 5)) // on → OOV 0, order preserved
    assert(enc(1) == List(1, 4, 2))
    assert(enc(2) == Nil) // tokenless doc → empty array, not a dropped row
    assert(enc(3) == List(0, 1)) // zebra → OOV
    // single corpus scan: only the vocab join — no second restore join
    // on the doc id (the vocab subtree contributes its own Generate, so
    // count joins, not explodes)
    val plan = TextAnalysis.encodeTokenIds(docs, "doc_id", "text", vocab)
      .queryExecution.optimizedPlan.toString
    assert("(?s)Join".r.findAllIn(plan).size == 1, plan)
    // a doc-id column named like the vocab's own columns must not
    // collide in the join
    val renamed = docs.toDF("id", "text")
    assert(TextAnalysis.encodeTokenIds(renamed, "id", "text", vocab)
      .filter(col("id") === 1L).collect().head.getSeq[Int](1).toList == List(1, 3, 2, 0, 1, 5))
  }

  test("decontamination + document frequency: substring hits only, vocab counts") {
    val corpus = Seq(
      (1L, "The quick   brown fox jumps over the lazy dog"), // extra spaces normalize away
      (2L, "totally unrelated content about other things entirely"),
      (3L, "prefix words then quick brown fox jumps inside this document"),
      (4L, "quick brown words but fox missing from this jumps sentence")).toDF("doc_id", "text")
    val probes = Seq((100L, "quick brown fox jumps")).toDF("probe_id", "probe")
    val hits = TextAnalysis.contaminated(corpus, "doc_id", "text", probes, "probe_id", "probe")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((100L, 1L), (100L, 3L)), s"got $hits")
    val freq = TextAnalysis.documentFrequency(corpus)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(freq("quick") == 3 && freq("unrelated") == 1)
    assert(freq("this") == 2) // distinct per doc, not per occurrence
    // a probe shorter than the n-gram key can never match — rejected
    // loudly instead of silently returning no hits
    val shortProbe = Seq((200L, "quick brown")).toDF("probe_id", "probe")
    intercept[IllegalArgumentException](
      TextAnalysis.contaminated(corpus, "doc_id", "text", shortProbe, "probe_id", "probe"))
  }

  test("as-of join: latest prior right row, inclusive ties, left semantics") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, "k1", ts(10)), (2L, "k1", ts(20)), (3L, "k2", ts(5)))
      .toDF("lid", "key", "ts")
    val right = Seq(("k1", ts(8), "a"), ("k1", ts(10), "b"), ("k1", ts(15), "c"),
      ("k2", ts(9), "d")).toDF("key", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "key", "ts", Seq("v"))
      .orderBy("lid").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ==
      Seq((1L, "b"), (2L, "c"), (3L, null))) // inclusive tie at ts=10; no prior for k2
    // NULL-ts right rows are never a match (SQL comparison semantics)
    val rightWithNull = right.unionByName(
      Seq(("k2", null.asInstanceOf[java.sql.Timestamp], "z")).toDF("key", "ts", "v"))
    val out2 = AsOfJoin.asOf(left, rightWithNull, "key", "ts", Seq("v"))
      .orderBy("lid").collect()
    assert(out2.map(r => (r.getLong(0), r.getString(3))).toSeq ==
      Seq((1L, "b"), (2L, "c"), (3L, null)))
  }

  test("range join: binned containment equals naive inequality join") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val points = (0 until 300 by 7).map(m => (m.toLong, "u" + (m % 3), ts(m)))
      .toDF("pid", "k", "pt")
    val intervals = Seq(("u0", ts(10), ts(100), "w1"), ("u1", ts(50), ts(60), "w2"),
      ("u2", ts(0), ts(299), "w3"), ("u0", ts(90), ts(120), "w4"))
      .toDF("k", "s", "e", "name")
    val binned = RangeJoin.pointInInterval(points, intervals, "k", "pt", "s", "e",
        Seq("name"), binSeconds = 600)
      .select("pid", "iv_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals, points("k") === intervals("k")
        && points("pt") >= intervals("s") && points("pt") <= intervals("e"))
      .select(points("pid"), intervals("name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("approximate aggregates: HLL distinct and approx percentile within tolerance") {
    val df = (0 until 20000).map(i => (i.toLong % 5000, i.toDouble)).toDF("k", "v")
    val approxDistinct = df.select(approx_count_distinct(col("k"), 0.01)).head().getLong(0)
    assert(math.abs(approxDistinct - 5000) < 5000 * 0.05, s"HLL estimate $approxDistinct")
    val p50 = df.select(percentile_approx(col("v"), lit(0.5), lit(1000))).head().getDouble(0)
    assert(math.abs(p50 - 10000.0) < 200, s"approx p50 $p50")
  }

  test("count-min sketch: frequency estimates bound exact counts from above") {
    val df = (Seq.fill(500)("hot") ++ (0 until 400).map(i => s"cold$i")).toDF("k")
    val cms = df.stat.countMinSketch("k", eps = 0.01, confidence = 0.95, seed = 42)
    assert(cms.estimateCount("hot") >= 500)
    assert(cms.estimateCount("hot") <= 500 + (0.01 * 900).toLong + 1)
    assert(cms.estimateCount("cold7") >= 1)
  }

  test("salted join: identical result set to a plain join") {
    val big = (1 to 500).map(i => (if (i % 5 == 0) 1L else i.toLong, i)).toDF("k", "payload")
    val dim = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val plain = big.join(dim, "k").select("k", "payload", "v")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, "k", saltFactor = 4)
      .select("k", "payload", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("joinPlanStats: exact with wide sketches; fan-out blow-up visible; est never undercounts") {
    // a: 300 rows over 3 keys (100x each); b: 30 rows over the same 3
    // keys (10x each) → join = 3·100·10 = 3000 rows, fanout 10
    val a = (0 until 300).map(i => ("k" + (i % 3), i)).toDF("k", "pa")
    val b = (0 until 30).map(i => ("k" + (i % 3), i)).toDF("k", "pb")
    val st = Skew.joinPlanStats(a, b, "k", depth = 4, width = 1024, k = 64).head()
    assert(st.getAs[Long]("rows_a") == 300L && st.getAs[Long]("rows_b") == 30L)
    assert(st.getAs[Long]("distinct_a") == 3L && st.getAs[Long]("distinct_b") == 3L)
    // 3 keys over 4×1024 buckets: collision-free → exact
    assert(st.getAs[Long]("est_join_rows") == 3000L)
    assert(st.getAs[Double]("est_fanout_a") == 10.0)
    // exact join size for a narrow sketch is still never undercounted
    val narrow = Skew.joinPlanStats(a, b, "k", depth = 2, width = 4, k = 64).head()
    assert(narrow.getAs[Long]("est_join_rows") >= 3000L)
    // disjoint key sets → join provably empty, fanout 0
    val c = (0 until 20).map(i => ("z" + i, i)).toDF("k", "pc")
    val dj = Skew.joinPlanStats(a, c, "k", depth = 4, width = 1024, k = 64).head()
    assert(dj.getAs[Long]("est_join_rows") == 0L)
    assert(dj.getAs[Double]("est_fanout_a") == 0.0)
    // an EMPTY or all-null-key side — on EITHER side, or both — must
    // still yield exactly one stats row of zeros (review finding: the
    // KMV legs used to annihilate the cross-join chain) — the
    // broadcast-obvious case most needs stats
    val empty = Seq.empty[(String, Int)].toDF("k", "pe")
    val nul = Seq((null.asInstanceOf[String], 1)).toDF("k", "pn")
    for (weird <- Seq(empty, nul)) {
      val got = Skew.joinPlanStats(a, weird, "k")
      assert(got.count() == 1L)
      val r = got.head()
      assert(r.getAs[Long]("rows_a") == 300L)
      assert(r.getAs[Long]("rows_b") == 0L && r.getAs[Long]("distinct_b") == 0L)
      assert(r.getAs[Long]("est_join_rows") == 0L)
      assert(r.getAs[Double]("est_fanout_a") == 0.0)
      // left side: rows_a = 0 exercises the fan-out division guard
      val l = Skew.joinPlanStats(weird, a, "k").head()
      assert(l.getAs[Long]("rows_a") == 0L && l.getAs[Long]("rows_b") == 300L)
      assert(l.getAs[Double]("est_fanout_a") == 0.0)
      val both = Skew.joinPlanStats(weird, weird, "k").head()
      assert(both.getAs[Long]("est_join_rows") == 0L)
    }
    // the persisted-sketch path returns the same stats row as the
    // build-from-raw path when fed the same sketches
    def side(df: org.apache.spark.sql.DataFrame) =
      df.select(lit("all").as("__k"), col("k").as("__v"))
    val fromSk = Skew.joinPlanStatsFromSketches(
      Sketch.cmSketch(side(a), "__k", "__v", 4, 1024),
      Sketch.cmSketch(side(b), "__k", "__v", 4, 1024),
      Sketch.kmvSketch(side(a), "__k", "__v", 64),
      Sketch.kmvSketch(side(b), "__k", "__v", 64), depth = 4, k = 64).head()
    assert(fromSk.toSeq == st.toSeq, "sketch-frame overload must match")
  }

  test("multimodal: payload plumbing, stub decode, frame sampling") {
    val df = Seq((1L, "hello world payload"), (2L, "x")).toDF("doc_id", "text")
    val withPayload = Multimodal.withBinaryPayload(df)
    assert(withPayload.schema("content").dataType.typeName == "binary")
    val meta = Multimodal.decodeMeta(withPayload).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 19 && meta(1L).ok)
    assert(meta(1L).width > 0 && meta(1L).height > 0)
    // deterministic across runs
    val meta2 = Multimodal.decodeMeta(withPayload).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L) == meta2(1L))
    val frames = Multimodal.sampleFrames(withPayload, frameBytes = 4, stride = 2)
    assert(frames.filter(col("doc_id") === 1).count() == 3) // ceil(19/4)=5 frames, keep 0,2,4
    // empty payload → zero frames (no phantom index)
    val empty = Multimodal.withBinaryPayload(Seq((9L, "")).toDF("doc_id", "text"))
    assert(Multimodal.sampleFrames(empty).count() == 0)
  }

  test("dedupParagraphs: first occurrence wins corpus-wide; normalization variants collapse") {
    val df = Seq(
      (1L, "alpha one\n\nshared para\n\nbeta two"),
      (2L, "shared para\n\ngamma three"),   // shared seen at (1,1) first
      (3L, "  SHARED, para!! \n\ndelta four"), // normalization variant of shared
      (4L, "alpha one\n\nalpha one"),       // cross-doc dup + within-doc dup
      (5L, "   \n\n\n"),                     // blank-only: row dropped
      (6L, "epsilon five\n\n\n\n\n\nzeta six") // 2+ newline runs = one separator
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupParagraphs(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha one\n\nshared para\n\nbeta two", 3L, 3L)))
    assert(out(2L) == (("gamma three", 2L, 1L)))
    assert(out(3L) == (("delta four", 2L, 1L)), "case/punct variant must collapse")
    assert(out(4L) == (("", 2L, 0L)), "both copies seen at doc 1 already")
    assert(!out.contains(5L), "no non-blank paragraphs -> dropped")
    assert(out(6L) == (("epsilon five\n\nzeta six", 2L, 2L)))
  }

  test("phash index: copies probe within distance, novels don't; append grows membership; heal") {
    val dir = tmpDir("phash-idx")
    val idx = dir.resolve("idx").toString
    def saw(core: Int, slope: Int): Array[Byte] =
      Array.tabulate(200 + core % 50)(i => ((core * 31 + i * slope) % 251).toByte)
    def reenc(b: Array[Byte]): Array[Byte] = b.zipWithIndex.map { case (v, i) =>
      if ((i >> 4) % 8 == 0) math.min(255, (v & 0xFF) + 40).toByte else v }
    val corpus = (0 until 30).map(c => (c.toLong, saw(c, 7))).toDF("id", "payload")
    Dedup.writePhashIndex(corpus, "id", "payload", idx)
    val batch = Seq(
      (100L, reenc(saw(3, 7))), // re-encode of indexed item 3
      (101L, saw(200, 11)),     // genuinely novel (different slope)
      (102L, null.asInstanceOf[Array[Byte]])) // undecodable: never matches
      .toDF("id", "payload")
    val m1 = Dedup.probePhashIndex(spark, idx, batch, "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m1 == Set((100L, 3L)), s"$m1")
    // append the novel (twice — a replayed append must be inert), then
    // a re-encode of it matches against the grown index
    val novel = Seq((101L, saw(200, 11))).toDF("id", "payload")
    Dedup.appendToPhashIndex(novel, "id", "payload", idx)
    Dedup.appendToPhashIndex(novel, "id", "payload", idx)
    val m2 = Dedup.probePhashIndex(spark, idx,
        Seq((200L, reenc(saw(200, 11)))).toDF("id", "payload"), "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(m2 == Seq((200L, 101L, 0)), s"$m2")
    // the delete→rename crash window heals at probe time
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + ".building"))
    assert(Dedup.probePhashIndex(spark, idx,
      Seq((201L, saw(3, 7))).toDF("id", "payload"), "id", "payload").count() >= 1)
  }

  test("compactPhashIndex: folds appended segments to one distinct set; probe identical; crash heal") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("phash-compact")
    val idx = dir.resolve("idx").toString
    def saw(core: Int, slope: Int): Array[Byte] =
      Array.tabulate(200 + core % 50)(i => ((core * 31 + i * slope) % 251).toByte)
    def reenc(b: Array[Byte]): Array[Byte] = b.zipWithIndex.map { case (v, i) =>
      if ((i >> 4) % 8 == 0) math.min(255, (v & 0xFF) + 40).toByte else v }
    Dedup.writePhashIndex((0 until 20).map(c => (c.toLong, saw(c, 7)))
      .toDF("id", "payload"), "id", "payload", idx)
    // three appended segments, one of them a crash replay
    val novel = Seq((100L, saw(300, 11))).toDF("id", "payload")
    Dedup.appendToPhashIndex(novel, "id", "payload", idx)
    Dedup.appendToPhashIndex(novel, "id", "payload", idx) // replay
    Dedup.appendToPhashIndex(Seq((101L, saw(400, 13))).toDF("id", "payload"),
      "id", "payload", idx)
    def fileCount() = new java.io.File(idx).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val filesBefore = fileCount()
    def probe() = Dedup.probePhashIndex(spark, idx,
        Seq((200L, reenc(saw(3, 7))), (201L, reenc(saw(300, 11))),
          (202L, saw(500, 17))).toDF("id", "payload"), "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = probe()
    assert(before.map(p => (p._1, p._2)) == Set((200L, 3L), (201L, 100L)), s"$before")
    Dedup.compactPhashIndex(spark, idx)
    assert(probe() == before, "compaction must not change probe results")
    assert(fileCount() < filesBefore,
      s"compaction must reduce segment files ($filesBefore -> ${fileCount()})")
    // the replayed append's duplicate signature collapsed physically
    val rows = spark.read.parquet(idx)
    assert(rows.count() == 22L && rows.count() == rows.distinct().count())
    // meta preserved verbatim (banding distance + hash kind)
    assert(Dedup.phashIndexMeta(spark, idx) ==
      Dedup.PhashIndexMeta(3, Dedup.DhashHashKind))
    // crash window between delete and rename: probe self-heals
    Files.move(Paths.get(idx), Paths.get(idx + ".compacting"))
    assert(probe() == before, "probe must heal the compaction crash window")
    assert(Files.exists(Paths.get(idx)))
    // append heals first too (never recreates a bare partial dir)
    Files.move(Paths.get(idx), Paths.get(idx + ".compacting"))
    Dedup.appendToPhashIndex(Seq((102L, saw(600, 19))).toDF("id", "payload"),
      "id", "payload", idx)
    assert(spark.read.parquet(idx).count() == 23L)
  }

  test("soft dedup: singletons weight scale, k-clique members scale/k; feeds prioritySample") {
    val rows = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val w = Dedup.softDedupWeights(rows, "id", pairs, scale = 999L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 3-clique {1,2,3}: cluster_id 1, size 3, weight 999/3
    Seq(1L, 2L, 3L).foreach(id => assert(w(id) == ((1L, 3L, 333L)), s"id $id: ${w(id)}"))
    // singletons: own id, size 1, full scale
    Seq(4L, 5L).foreach(id => assert(w(id) == ((id, 1L, 999L)), s"id $id: ${w(id)}"))
    // the integer weight satisfies prioritySample's typed contract and
    // clique members sample at 1/3 a singleton's effective weight
    val sampled = graft.ops.Sampling.prioritySample(
      Dedup.softDedupWeights(rows, "id", pairs, scale = 999L),
      col("id"), col("weight"), n = 5)
    assert(sampled.count() == 5)
    // weight 0 (scale < cluster size) rows are excluded by the sampler
    val tiny = graft.ops.Sampling.prioritySample(
      Dedup.softDedupWeights(rows, "id", pairs, scale = 2L),
      col("id"), col("weight"), n = 5)
    assert(tiny.collect().map(_.getLong(0)).toSet == Set(4L, 5L))
  }

  test("snapshot diff: churn classification; index diff vs own append = exactly the batch") {
    val dir = tmpDir("snapdiff")
    // per-group churn: edits = remove+add, moves charge both groups
    val v1 = Seq(("a", "kept"), ("a", "edited-old"), ("a", "dropped"),
      ("b", "moves-to-a")).toDF("src", "text")
    val v2 = Seq(("a", "kept"), ("a", "edited-new"), ("a", "moves-to-a"),
      ("b", "brand-new")).toDF("src", "text")
    val churn = Dedup.corpusChurn(v1, v2, "text", "src")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(churn("a") == ((2L, 2L, 1L)), s"a: ${churn("a")}") // +edited-new +moves-to-a / -edited-old -dropped / kept
    assert(churn("b") == ((1L, 1L, 0L)), s"b: ${churn("b")}") // +brand-new / -moves-to-a
    // index-level: diff of an index against (itself + appended batch)
    // is exactly the batch — and duplicate append segments don't count
    val p1 = dir.resolve("idx1").toString
    val p2 = dir.resolve("idx2").toString
    val base = docs.filter(col("doc_id") < 60)
    val batch = Seq((9000001L, "wholly new snapshot doc one"),
      (9000002L, "wholly new snapshot doc two")).toDF("doc_id", "text")
    Dedup.writeDigestIndex(base, "text", p1)
    Dedup.writeDigestIndex(base, "text", p2)
    Dedup.appendToDigestIndex(batch, "text", p2)
    Dedup.appendToDigestIndex(batch, "text", p2) // replayed append
    val Array(row) = Dedup.diffDigestIndexes(spark, p1, p2).collect()
    val nBase = spark.read.parquet(p1).distinct().count()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 0L, nBase)),
      s"$row vs base $nBase")
    // reversed direction: the batch reads as removed
    val Array(rev) = Dedup.diffDigestIndexes(spark, p2, p1).collect()
    assert((rev.getLong(0), rev.getLong(1), rev.getLong(2)) == ((0L, 2L, nBase)))
    // both snapshots empty: the diff is (0,0,0), never a row of nulls
    // (global aggregates over zero groups sum to NULL without the
    // coalesce — the r8 empty-side class)
    val pe1 = dir.resolve("empty1").toString
    val pe2 = dir.resolve("empty2").toString
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.writeDigestIndex(noDocs, "text", pe1)
    Dedup.writeDigestIndex(noDocs, "text", pe2)
    val Array(zero) = Dedup.diffDigestIndexes(spark, pe1, pe2).collect()
    assert((zero.getLong(0), zero.getLong(1), zero.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("near-dup snapshot diff: re-encode retained, novel added, missing removed; distance contract") {
    val dir = tmpDir("phash-diff")
    val p1 = dir.resolve("v1").toString
    val p2 = dir.resolve("v2").toString
    def saw(core: Int, slope: Int): Array[Byte] =
      Array.tabulate(200 + core % 50)(i => ((core * 31 + i * slope) % 251).toByte)
    def reenc(b: Array[Byte]): Array[Byte] = b.zipWithIndex.map { case (v, i) =>
      if ((i >> 4) % 8 == 0) math.min(255, (v & 0xFF) + 40).toByte else v }
    // v1: three items; v2: a re-encode of item 0 under a FRESH id
    // (re-crawl semantics), plus one structurally novel item — items
    // 1 and 2 have no v2 counterpart
    Dedup.writePhashIndex(
      Seq((0L, saw(0, 7)), (1L, saw(20, 7)), (2L, saw(40, 7)))
        .toDF("doc_id", "content"), "doc_id", "content", p1)
    Dedup.writePhashIndex(
      Seq((100L, reenc(saw(0, 7))), (101L, saw(33, 11)))
        .toDF("doc_id", "content"), "doc_id", "content", p2)
    val Array(r) = Dedup.diffPhashIndexes(spark, p1, p2).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 1L)),
      s"(added, removed, retained) = $r")
    // (an exact-digest diff of the same corpora would report the
    // re-encode as remove+add — the perceptual identity is the point)
    // replayed appends collapse: duplicate signature rows change nothing
    Dedup.appendToPhashIndex(
      Seq((100L, reenc(saw(0, 7)))).toDF("doc_id", "content"),
      "doc_id", "content", p2)
    val Array(r2) = Dedup.diffPhashIndexes(spark, p1, p2).collect()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((1L, 2L, 1L)))
    // mixed banding distances are a typed error, never a silent miss
    val p3 = dir.resolve("v3").toString
    Dedup.writePhashIndex(Seq((0L, saw(0, 7))).toDF("doc_id", "content"),
      "doc_id", "content", p3, maxDistance = 7)
    intercept[IllegalArgumentException] {
      Dedup.diffPhashIndexes(spark, p1, p3)
    }
    // two empty snapshots diff to (0, 0, 0), never a row of nulls
    val pe1 = dir.resolve("e1").toString
    val pe2 = dir.resolve("e2").toString
    val none = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "content")
    Dedup.writePhashIndex(none, "doc_id", "content", pe1)
    Dedup.writePhashIndex(none, "doc_id", "content", pe2)
    val Array(z) = Dedup.diffPhashIndexes(spark, pe1, pe2).collect()
    assert((z.getLong(0), z.getLong(1), z.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("persisted LM filter: reference counts score candidates; unseen language scores 0") {
    val dir = tmpDir("lm")
    val path = dir.resolve("lm").toString
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran on the mat"),
      (3L, "the dog sat on the mat")).toDF("doc_id", "text")
    Lm.writeLmIndex(ref, "doc_id", "text", path)
    def score(t: String): (Long, Double) = {
      val r = Lm.scoreWithLm(spark, path, Seq((9L, t)).toDF("doc_id", "text"),
        "doc_id", "text").collect()(0)
      (r.getLong(1), r.getDouble(2))
    }
    // in-reference phrasing scores high: P(cat|the)=2/6, P(sat|cat)=1/2 …
    val (n1, s1) = score("the cat sat")
    assert(n1 == 2 && s1 > 0.3, s"$s1")
    // out-of-reference language: every bigram unseen -> exactly 0
    assert(score("quantum flux capacitor overload") == ((3L, 0.0)))
    // seen words in unseen order: contexts exist, bigrams don't -> 0
    assert(score("mat the on sat")._2 == 0.0)
    // mixed: unseen bigrams pull the mean down, not poison it
    val (_, sMix) = score("the cat flux capacitor")
    assert(sMix > 0.0 && sMix < s1, s"$sMix vs $s1")
    // single-token docs have no bigrams: dropped, not scored
    assert(Lm.scoreWithLm(spark, path, Seq((9L, "the")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    // the model joins are explicit broadcasts (the model is bounded by
    // the reference's bigram vocabulary by construction) — the batch
    // side never shuffles for them
    val plan = Lm.scoreWithLm(spark, path,
        Seq((9L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("perplexity buckets: planted reference-like docs land head, gibberish tail; deterministic") {
    val dir = tmpDir("ccnet")
    val path = dir.resolve("lm").toString
    Lm.writeLmIndex(Seq((1L, ("the cat sat on the mat " * 10).trim))
      .toDF("doc_id", "text"), "doc_id", "text", path)
    // doc i = fixed reference-like prefix + (i−1) unseen-bigram pairs:
    // scores strictly decrease with i, so bucket labels must be a
    // monotone function of doc_id (head block, then middle, then tail)
    val cands = (1 to 30).map { i =>
      val good = "the cat sat on the mat the cat sat on the mat"
      val bad = (1 until i).map(j => s"zz$j qq$j").mkString(" ")
      (i.toLong, (good + " " + bad).trim)
    }.toDF("doc_id", "text")
    val keepAll = Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 1.0)
    val all = Lm.perplexityBucketSample(spark, path, cands, "doc_id", "text",
        fractions = keepAll)
      .collect().map(r => r.getLong(0) -> r.getString(4)).sortBy(_._1)
    assert(all.length == 30) // keep-everything fractions drop nothing
    // planted extremes: the pure-reference doc is head, the most
    // gibberish-laden doc is tail — the CCNet orientation (high mean
    // probability = reference-like = head)
    assert(all.head == (1L -> "head"), s"${all.head}")
    assert(all.last == (30L -> "tail"), s"${all.last}")
    assert(all.map(_._2).distinct.toSeq == Seq("head", "middle", "tail"),
      s"labels must transition monotonically: ${all.map(_._2).mkString(",")}")
    // deterministic under partitioning (hash selection + exact
    // integer thresholds, no RNG)
    val again = Lm.perplexityBucketSample(spark, path,
        cands.repartition(7), "doc_id", "text", fractions = keepAll)
      .collect().map(r => r.getLong(0) -> r.getString(4)).sortBy(_._1)
    assert(again.toSeq == all.toSeq)
    // real fractions: a subset, with every head row kept (rate 1.0)
    val sampled = Lm.perplexityBucketSample(spark, path, cands,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val allMap = all.toMap
    assert(sampled.keySet.subsetOf(allMap.keySet) &&
      sampled.forall { case (id, b) => allMap(id) == b })
    assert(allMap.filter(_._2 == "head").keySet.subsetOf(sampled.keySet),
      "head bucket is keep-everything at fraction 1.0")
    // bucket keys are a fixed contract, rejected loudly otherwise
    intercept[IllegalArgumentException] {
      Lm.perplexityBucketSample(spark, path, cands, "doc_id", "text",
        fractions = Map("hi" -> 1.0, "lo" -> 0.5))
    }
  }

  test("empty postings index: typed error on query, first real append recovers") {
    val dir = tmpDir("postings-empty")
    val idx = dir.resolve("idx").toString
    // all-null-text corpus -> n_docs = 0, total_dl = NULL in _meta
    val empty = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    Ranking.writePostingsIndex(empty, "doc_id", "text", idx, numFiles = 2)
    intercept[graft.NoDataError] {
      Ranking.queryPostingsIndex(spark, idx, Seq("sphinx"))
    }
    // appending the first real batch to the empty index is legitimate
    // (NULL total_dl reads as 0, not NPE) and makes the index servable
    Ranking.appendToPostingsIndex(
      Seq((2L, "sphinx of the quick dog")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val served = Ranking.queryPostingsIndex(spark, idx, Seq("sphinx"),
      logIdf = false).collect()
    assert(served.length == 1 && served(0).getLong(0) == 2L)
  }

  test("postings index: served BM25 equals the corpus scan bitwise; term files prune; heal") {
    val dir = tmpDir("postings")
    val idx = dir.resolve("idx").toString
    val corpus = docs.unionByName(
      Seq((200L, "sphinx sphinx sphinx of the quick dog")).toDF("doc_id", "text"))
    Ranking.writePostingsIndex(corpus, "doc_id", "text", idx, numFiles = 4)
    for (logIdf <- Seq(true, false)) {
      val terms = Seq("sphinx", "quick", "dog", "zzz-absent")
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val served = m(Ranking.queryPostingsIndex(spark, idx, terms, logIdf = logIdf))
      val scanned = m(Ranking.bm25(corpus, "doc_id", "text", terms, logIdf = logIdf))
      assert(served == scanned, s"logIdf=$logIdf: served $served vs scanned $scanned")
      assert(served.nonEmpty)
    }
    // the queried-term scan reads pruned postings, never the corpus:
    // the filter reaches the parquet scan as a pushed IN predicate
    val plan = Ranking.queryPostingsIndex(spark, idx, Seq("sphinx"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"), plan.take(400))
    // null-text docs are excluded from the stats, not poisoned into them
    val withNull = corpus.unionByName(
      Seq((300L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val idx2 = dir.resolve("idx2").toString
    Ranking.writePostingsIndex(withNull, "doc_id", "text", idx2)
    assert(spark.read.parquet(idx2 + "/_meta").collect()(0).getLong(0) == corpus.count())
    // heal: the delete->rename crash window recovers at query time
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + ".building"))
    assert(Ranking.queryPostingsIndex(spark, idx, Seq("sphinx")).count() > 0)
  }

  test("rrfFuse: exact integer fusion, single-list items, k/scale contract") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Ranking.rrfFuse(Seq(a, b), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    def c(r: Int) = 1000000000L / (60L + r)
    assert(out === Map(
      1L -> (c(1), 1), 2L -> (c(2) + c(1), 2), 3L -> (c(3), 1), 4L -> (c(2), 1)))
    // doc 2 (rank 2 + rank 1) out-fuses doc 1 (rank 1 alone) — the
    // consensus property RRF exists for
    assert(out(2L)._1 > out(1L)._1)
    val custom = Ranking.rrfFuse(Seq(a), "doc_id", k = 0, scale = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(custom === Map(1L -> 100L, 2L -> 50L, 3L -> 33L))
    intercept[IllegalArgumentException](Ranking.rrfFuse(Nil, "doc_id"))
  }

  test("postings index lifecycle: append ≡ rebuild, compact restores layout, meta heals") {
    val dir = tmpDir("postings-life")
    val idx = dir.resolve("idx").toString
    val a = docs.filter(col("doc_id") < 100)
    val b = docs.filter(col("doc_id") >= 100)
    Ranking.writePostingsIndex(a, "doc_id", "text", idx, numFiles = 4)
    Ranking.appendToPostingsIndex(b, "doc_id", "text", idx)
    val terms = Seq("sphinx", "quick", "the")
    def served() = Ranking.queryPostingsIndex(spark, idx, terms, logIdf = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val afterAppend = served()
    // append ≡ a fresh build over the whole corpus
    val full = dir.resolve("full").toString
    Ranking.writePostingsIndex(docs, "doc_id", "text", full, numFiles = 4)
    val rebuilt = Ranking.queryPostingsIndex(spark, full, terms, logIdf = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(afterAppend == rebuilt, "append must serve identically to a rebuild")
    // compact: same answers, restored term-sorted layout
    Ranking.compactPostingsIndex(spark, idx, numFiles = 4)
    assert(served() == rebuilt, "compaction must not change answers")
    // meta repair heals a stats-stale index (simulate the crash window:
    // postings appended, meta still the OLD build's)
    val idx2 = dir.resolve("idx2").toString
    Ranking.writePostingsIndex(a, "doc_id", "text", idx2, numFiles = 2)
    val fs = new org.apache.hadoop.fs.Path(idx2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // raw postings append with no meta update = the documented window
    spark.read.parquet(full).join(
        b.select(col("doc_id").as("d2")), col("doc_id") === col("d2"))
      .select("term", "doc_id", "tf", "dl")
      .write.mode("append").parquet(idx2)
    Ranking.repairPostingsMeta(spark, idx2)
    val healed = Ranking.queryPostingsIndex(spark, idx2, terms, logIdf = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(healed == rebuilt, "repaired meta must serve exactly like a rebuild")
    // a REPLAYED append (identical rows laid down twice) cannot
    // double-count: readers dedup rows, repair heals the stats
    spark.read.parquet(full).join(
        b.select(col("doc_id").as("d2")), col("doc_id") === col("d2"))
      .select("term", "doc_id", "tf", "dl")
      .write.mode("append").parquet(idx2)
    Ranking.repairPostingsMeta(spark, idx2)
    assert(Ranking.queryPostingsIndex(spark, idx2, terms, logIdf = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == rebuilt,
      "duplicate posting rows must not change scores")
    // a half-done meta rebuild heals at query time
    fs.rename(new org.apache.hadoop.fs.Path(idx2 + "/_meta"),
      new org.apache.hadoop.fs.Path(idx2 + "/_meta.rebuilding"))
    assert(Ranking.queryPostingsIndex(spark, idx2, terms, logIdf = false)
      .collect().nonEmpty)
  }

  test("normalizeUrl / hostOf / registrableDomain: canonical forms and edge cases") {
    def norm(u: String): String =
      Seq(Tuple1(u)).toDF("u").select(Web.normalizeUrl(col("u"))).collect()(0).getString(0)
    def host(u: String): String =
      Seq(Tuple1(u)).toDF("u").select(Web.hostOf(col("u"))).collect()(0).getString(0)
    def dom(h: String): String =
      Seq(Tuple1(h)).toDF("h").select(Web.registrableDomain(col("h"))).collect()(0).getString(0)
    // case folds scheme+host only; default ports and fragments go
    assert(norm("HTTP://WWW.Example.COM:80/Path/X#frag") == "http://www.example.com/Path/X")
    assert(norm("https://a.io:443/") == "https://a.io")
    // non-default port kept; path case kept
    assert(norm("http://a.io:8080/A/") == "http://a.io:8080/A")
    // default-port strip is scheme-conditional: a MISMATCHED default
    // port is a distinct origin and must survive
    assert(norm("https://a.io:80/x") == "https://a.io:80/x")
    assert(norm("http://a.io:443/x") == "http://a.io:443/x")
    // userinfo keeps its case (credentials are case-significant);
    // scheme and host still fold, default port still strips
    assert(norm("HTTP://UserA:PW@Example.COM:80/x") == "http://UserA:PW@example.com/x")
    // tracking params drop, real params survive in order; bare '?' drops
    assert(norm("http://a.io/p?utm_source=x&id=3&fbclid=z&b=2") == "http://a.io/p?id=3&b=2")
    assert(norm("http://a.io/p?utm_campaign=only") == "http://a.io/p")
    assert(norm("http://a.io/p?ref") == "http://a.io/p")
    // '?' inside the query stays with it; trailing slash strips pre-query
    assert(norm("http://a.io/p/?q=a?b") == "http://a.io/p?q=a?b")
    // scheme-less input: no authority folding, still slash/fragment/query rules
    assert(norm("  Relative/Path/#f  ") == "Relative/Path")
    assert(host("https://User:pw@Sub.Site.ORG:8443/x") == "sub.site.org")
    assert(host("no-scheme/path") == "")
    assert(dom("www.example.com") == "example.com")
    assert(dom("a.b.co.uk") == "b.co.uk")
    assert(dom("a.b.co.com") == "co.com")    // 3-letter TLD: plain last-two rule
    assert(dom("localhost") == "localhost")
    // blocklist screen drops exactly the blocked domains (broadcast anti)
    val rows = Seq((1L, "example.com"), (2L, "kept.org"), (3L, "example.com"))
      .toDF("id", "domain")
    val blocked = Seq(Tuple1("example.com")).toDF("domain")
    assert(Web.blocklistScreen(rows, "domain", blocked)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  private def extract(html: String): String = {
    val df = Seq(Tuple1(html)).toDF("h")
    df.select(TextAnalysis.extractText(col("h")).as("t")).collect()(0).getString(0)
  }

  test("extractText: basic page — scripts/styles/comments gone, text joined by spaces") {
    val html = """<html><head><title>T</title><style>p{a:1}</style>
      |<script>if (a < b) { s = "<p>no</p>"; }</script></head>
      |<body><!-- c --><h1>Head</h1><p>one</p><p>two</p></body></html>""".stripMargin
    assert(extract(html) == "T Head one two")
  }

  test("extractText: case-insensitive multiline blocks, entities, nbsp") {
    assert(extract("<SCRIPT a=1>\nvar x;\n</SCRIPT ><P>AT&amp;T&nbsp;&lt;y&gt; &quot;q&quot; &#39;s</P>")
      == "AT&T <y> \"q\" 's")
    assert(extract("<STYLE>\nh1 > em { }\n</STYLE>ok") == "ok")
  }

  test("extractText: double-escaped entities decode exactly one level") {
    assert(extract("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
    assert(extract("&amp;amp;") == "&amp;")
  }

  test("extractText: CDATA content kept; markup inside CDATA stripped (documented deviation)") {
    // unwrap splices content in-place (no spaces added)
    assert(extract("a<![CDATA[kept text]]>b") == "akept textb")
    // unwrap happens before tag strip, so tag-like CDATA content is stripped too
    assert(extract("<p><![CDATA[x <raw> y]]></p>") == "x y")
  }

  test("extractText: unclosed/nested/bare-angle edge cases are conservative, never crash") {
    // unclosed comment: '<!-- foo > rest' — tag regex eats '<!-- foo >', rest survives
    assert(extract("<!-- foo > rest") == "rest")
    // unclosed script: only its open tag is stripped (no matching close)
    assert(extract("<script>var x = 1; rest") == "var x = 1; rest")
    // nested same-name close: non-greedy stops at FIRST </script>
    assert(extract("<script>a = '</script>'; b</script>done") == "'; b done")
    // bare '<' with no later '>' passes through
    assert(extract("i < 3 and done") == "i < 3 and done")
    // entities inside attributes vanish with the tag
    assert(extract("<a href=\"?a=1&amp;b=2\">link</a>") == "link")
    // attribute containing '>' splits the tag early (documented regex semantics)
    assert(extract("<img alt=\"x > y\">z") == "y\">z")
    assert(extract("<p title='a'>t</p>") == "t")
  }

  test("extractText: whitespace normalization and idempotence on plain text") {
    assert(extract("  a \t b \n\n c  ") == "a b c")
    val plain = "already extracted plain text"
    assert(extract(plain) == plain)
  }
}
