package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard verification.
  *
  * Scale design:
  *   - exact dedup is one hash-shuffle on the key (map-side partial
  *     aggregation applies);
  *   - MinHash/LSH never forms the O(n²) pair space — signatures are
  *     per-row narrow maps, and candidate generation is an equi-join on
  *     (band, bandHash), i.e. a shuffle keyed on buckets;
  *   - a bucket-size cap guards against degenerate skew (a giant bucket
  *     of near-identical boilerplate would otherwise quadratically blow
  *     up one task — the classic web-dedup failure mode);
  *   - SimHash is a per-row 64-bit signature; near-dup = hamming ≤ t via
  *     band join on bit chunks.
  */
object Dedup {

  /** Keep one row (minimum id) per exact key. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dup groups: canonical (min) id + duplicate count per key. */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup keyed on a 128-bit content hash instead of the raw
    * column — at 100 TB, shuffling md5 digests instead of multi-KB
    * documents cuts exchange volume by orders of magnitude (collision
    * probability ~n²/2¹²⁸, negligible below ~10¹⁵ docs). */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(contentCol).cast("binary"))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** [[exactGroups]] keyed on the md5 digest: same (canonical_id,
    * dup_count) output, but the shuffle carries 16-byte digests instead
    * of full documents, and the map-side partial aggregate reduces each
    * partition before the exchange (the window variant can't). */
  def exactGroupsByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("__digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
      .drop("__digest")

  /** Incremental exact dedup — clean a NEW batch against an existing
    * corpus: drops batch rows whose content digest already exists in the
    * corpus (left-anti join on 16-byte md5 digests; document text never
    * enters the shuffle) and keeps the min-id representative of each
    * duplicate group *within* the batch. The continuous-ingest shape at
    * 100 TB: the corpus reduces to a digest projection (in practice a
    * digest index maintained across ingests — pass it with
    * `corpusIsDigest = true`), the anti join and the
    * in-batch window both shuffle on digests only, and the batch side is
    * small relative to the corpus.
    *
    * With `corpusIsDigest = true`, `corpus`'s `contentCol` already holds
    * md5 hex digests and is used as the join key directly — hashing it a
    * second time would silently match nothing. */
  def incrementalExact(batch: DataFrame, corpus: DataFrame,
      contentCol: String, idCol: String,
      corpusIsDigest: Boolean = false): DataFrame = {
    val dig = md5(col(contentCol).cast("binary"))
    // anti-join semantics are unaffected by duplicate build-side keys, so
    // the distinct is purely a build-side reduction — worth a hash agg
    // when the corpus is raw documents (dup-heavy), pure overhead when it
    // is already a digest index (appends rarely duplicate; the index
    // probe must stay ONE narrow anti-join)
    val corpusDigests =
      if (corpusIsDigest) corpus.select(col(contentCol).as("__digest"))
      else corpus.select(dig.as("__digest")).distinct()
    val fresh = batch.withColumn("__digest", dig)
      .join(corpusDigests, Seq("__digest"), "left_anti")
    val w = Window.partitionBy(col("__digest")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__digest")
  }

  // ------------------------------------------------- persisted digest index

  /** Persist the corpus' content digests as an exact-dedup membership
    * index: one parquet of distinct 16-byte md5 hex digests. The
    * continuous-ingest companion to [[incrementalExact]]: the corpus is
    * hashed ONCE at write time, and every later batch is cleaned by an
    * anti-join against the stored digests — the corpus text is never
    * re-read. At 100 TB the index is ~32 bytes/doc (0.003% of a 1 MB/doc
    * corpus) and the probe is one narrow hash join. */
  def writeDigestIndex(corpus: DataFrame, contentCol: String,
      path: String): Unit =
    corpus.select(md5(col(contentCol).cast("binary")).as("digest"))
      .distinct()
      .write.mode("overwrite").parquet(path)

  /** Add a (typically already-[[probeDigestIndex]]-cleaned) batch's
    * digests to the index. Appends may duplicate a digest across
    * segments — probes are membership tests, so correctness is
    * unaffected; [[compactDigestIndex]] re-distincts when append
    * volume warrants it. */
  def appendToDigestIndex(batch: DataFrame, contentCol: String,
      path: String): Unit =
    batch.select(md5(col(contentCol).cast("binary")).as("digest"))
      .distinct()
      .write.mode("append").parquet(path)

  /** Clean a new batch against a [[writeDigestIndex]] index: drop rows
    * whose content digest is already present, keep the min-id
    * representative of in-batch duplicate groups (exactly
    * [[incrementalExact]]'s contract, served from the index). */
  def probeDigestIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, contentCol: String,
      idCol: String): DataFrame = {
    FsOps.healSwap(spark, indexPath + ".compacting", indexPath)
    // one contract, one implementation: the index IS a digest corpus
    incrementalExact(batch,
      spark.read.parquet(indexPath).withColumnRenamed("digest", contentCol),
      contentCol, idCol, corpusIsDigest = true)
  }

  /** Rewrite the digest index as one distinct set — one narrow
    * aggregate over 16-byte keys, swapped in with the two-phase
    * [[FsOps]] discipline (readers see old or new, never a mix). */
  def compactDigestIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    FsOps.healSwap(spark, path + ".compacting", path)
    val tmp = path + ".compacting"
    spark.read.parquet(path).distinct()
      .write.mode("overwrite").parquet(tmp)
    FsOps.swapDirs(spark, tmp, path)
  }

  // ------------------------------------------------- corpus snapshot diff

  /** Per-group churn between two corpus snapshots — the dataset-
    * versioning report every production corpus refresh needs: for each
    * `groupCol` value (domain, source, shard), how many distinct
    * documents were added, removed, and retained from v1 to v2.
    * Membership is by content digest (md5 — equality ≡ text equality
    * at any realistic scale, the d12 contract), so an edited document
    * counts as one removal plus one addition, and a document that
    * moved groups counts against both groups — group-wise set algebra
    * on (group, digest) keys.
    *
    * Shape: union with side markers → ONE hash aggregate on
    * (group, digest) (map-side combinable) → one tiny per-group
    * aggregate. No join — so no null-key join trap (null content
    * digests group together on both sides) and exactly one wide
    * shuffle of 16-byte digest rows at any corpus size. */
  def corpusChurn(v1: DataFrame, v2: DataFrame, contentCol: String,
      groupCol: String): DataFrame = {
    def side(df: DataFrame, a: Int, b: Int) =
      df.select(col(groupCol).as("grp"),
        md5(col(contentCol).cast("binary")).as("digest"),
        lit(a).as("v1"), lit(b).as("v2"))
    side(v1, 1, 0).unionByName(side(v2, 0, 1))
      .groupBy(col("grp"), col("digest"))
      .agg(max(col("v1")).as("in1"), max(col("v2")).as("in2"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("in2") === 1 && col("in1") === 0, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in1") === 1 && col("in2") === 0, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in1") === 1 && col("in2") === 1, 1L).otherwise(0L)).as("n_retained"))
  }

  /** Set-algebra diff of two persisted [[writeDigestIndex]] snapshots:
    * one row `(n_added, n_removed, n_retained)` — what changed between
    * corpus v1 and v2, computed entirely over the bounded digest rows
    * (the corpora are never re-read). Same union-and-aggregate shape
    * as [[corpusChurn]]; append-duplicated digests collapse in the
    * membership aggregate, so an uncompacted index diffs exactly like
    * a compacted one. */
  def diffDigestIndexes(spark: org.apache.spark.sql.SparkSession,
      pathV1: String, pathV2: String): DataFrame = {
    FsOps.healSwap(spark, pathV1 + ".compacting", pathV1)
    FsOps.healSwap(spark, pathV2 + ".compacting", pathV2)
    def side(p: String, a: Int, b: Int) =
      spark.read.parquet(p).select(col("digest"),
        lit(a).as("v1"), lit(b).as("v2"))
    side(pathV1, 1, 0).unionByName(side(pathV2, 0, 1))
      .groupBy(col("digest"))
      .agg(max(col("v1")).as("in1"), max(col("v2")).as("in2"))
      .agg(
        // coalesce: a global aggregate over two EMPTY indexes emits one
        // row whose sums are NULL (the r8 empty-side class) — the diff
        // of two empty snapshots is (0, 0, 0), not a row of nulls
        coalesce(sum(when(col("in2") === 1 && col("in1") === 0, 1L).otherwise(0L)),
          lit(0L)).as("n_added"),
        coalesce(sum(when(col("in1") === 1 && col("in2") === 0, 1L).otherwise(0L)),
          lit(0L)).as("n_removed"),
        coalesce(sum(when(col("in1") === 1 && col("in2") === 1, 1L).otherwise(0L)),
          lit(0L)).as("n_retained"))
  }

  /** Evaluate `c` ONCE and pass the bound value to `f`. Higher-order
    * functions block Spark's common-subexpression elimination, so an
    * expensive expression referenced inside a `transform` lambda would
    * otherwise be re-evaluated per array element (observed 5× slowdown
    * on shingling). A 1-element `transform` materializes it as a lambda
    * variable. */
  private[ops] def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Distinct character n-gram shingles of a string column. */
  def charShingles(text: Column, n: Int): Column = bindOnce(text) { t =>
    val len = length(t)
    when(len < n, array(t)).otherwise(
      array_distinct(transform(sequence(lit(0), len - n),
        i => t.substr(i + lit(1), lit(n)))))
  }

  /** Distinct word n-gram shingles from a token array. */
  def wordShingles(toks: Column, n: Int): Column = bindOnce(toks) { tk =>
    when(size(tk) < n, array(concat_ws(" ", tk))).otherwise(
      array_distinct(transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
  }

  /** MinHash signature (k hashes) over a shingle array: each shingle is
    * hashed once, each signature slot is the min of a re-seeded mix —
    * a custom codegen-invoked tight loop ([[graft.functions.MinHashImpl]]);
    * the declarative `array_min(transform(…))` × k form allocates k
    * intermediate arrays per row. */
  def minhashSignature(shingles: Column, k: Int = 64): Column =
    graft.functions.MinHash.signature(shingles, k)

  /** Candidate near-dup pairs (idA < idB) via MinHash LSH banding.
    *
    * Cost shape (the part that must survive 100 TB):
    *   1. the signature is MATERIALIZED once per row before banding —
    *      slicing an unreferenced signature expression per band would
    *      recompute all k hashes `numBands` times;
    *   2. banded rows are narrow (id, band, bandHash) — shingle arrays
    *      never enter the shuffle;
    *   3. pairs are generated bucket-locally from `collect_list` (no
    *      self-join materializing the bucket cross product row set);
    *   4. shingles are re-attached only to the (small) candidate set.
    *
    * @param maxBucket skew guard: buckets larger than this are dropped
    *        (boilerplate clusters; handle those with exact dedup on the
    *        shingle-set hash instead of pairwise comparison).
    */
  def minhashCandidates(df: DataFrame, idCol: String, shingleCol: String,
      numHashes: Int = 64, numBands: Int = 16, maxBucket: Int = 1000): DataFrame = {
    // (id, shingles) is consumed three times (signature, both sides of the
    // verify re-attach); caching avoids recomputing tokenization+shingling
    // per consumer. MEMORY_AND_DISK — spills rather than OOMs at scale.
    val base = df.select(col(idCol).as("id"), col(shingleCol).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same banding as the persisted index (bandRows) — the batch and
    // index paths MUST band identically to stay comparable
    val pairs = bandRows(base, numHashes, numBands).groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candidates = pairs
      .join(base.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
    // candidates are small by construction — materialize them eagerly so
    // the shingled base cache can be released (no per-call cache leak).
    // Lineage.cut: executor-local by default; set a SparkContext
    // checkpoint dir to make it reliable for long-running cluster jobs.
    val cut = Lineage.cut(candidates)
    base.unpersist()
    cut
  }

  /** Exact Jaccard similarity of two shingle-array columns — a
    * codegen-invoked hash-set kernel ([[graft.functions.JaccardImpl]]);
    * the declarative `size(array_intersect) /
    * greatest(size(array_union), 1)` form materializes two whole
    * arrays per candidate pair just to measure them. Same
    * distinct/byte-equality semantics and the same exact int ratio, so
    * oracle hashes are unchanged.
    *
    * STRING CONTRACT: elements are compared by their STRING form (the
    * kernel casts both arrays to `array<string>`). For the intended
    * shingle/token arrays that is exact; for numeric arrays it differs
    * from SQL equality on value-equal-but-differently-rendered elements
    * (`-0.0` vs `0.0`, int `1` vs double `1.0`). Numeric set overlap
    * should use the declarative `array_intersect`/`array_union` form
    * instead. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.Jaccard.jaccard(a, b)

  /** Fused text → distinct word-n-gram shingles (custom codegen kernel). */
  def textShingles(text: Column, n: Int): Column =
    graft.functions.TextShingles.textShingles(text, n)

  /** Near-dup pairs: LSH candidates verified with exact n-gram Jaccard.
    *
    * Recall is tunable via banding: the default (16 bands × 4 rows)
    * trades a small miss rate at the threshold for a small candidate
    * set; `numBands = numHashes` (1 row per band) makes candidate
    * generation effectively exhaustive for s ≥ 0.6 (miss probability
    * (1-s)^64 ≈ 3e-26) at the cost of more candidates to verify. */
  def nearDupPairs(df: DataFrame, idCol: String, shingleCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, numBands: Int = 16,
      maxBucket: Int = 1000): DataFrame =
    minhashCandidates(df, idCol, shingleCol, numHashes, numBands, maxBucket)
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Connected components over a verified-pair edge list.
    *
    * The pair graph is orders of magnitude smaller than the corpus (it
    * only contains ids that LSH + Jaccard verified as near-dups), so up
    * to `driverThreshold` edges we collect ids and run an O(E α(E))
    * union-find on the driver — one job, no iteration. Beyond that, the
    * distributed fallback is [[graft.ops.Graph.connectedComponentsStar]]
    * (alternating large-star/small-star): O(log n) rounds regardless of
    * component diameter, where the earlier min-label propagation needed
    * O(diameter) — a chain-shaped dup cluster (serial-numbered
    * boilerplate) made that unbounded. `maxIter` caps its rounds.
    *
    * `driverThreshold` sizing (VERDICT r11 scale-watch): 1M edge Rows ≈
    * tens of MB of driver heap — comfortably inside any default
    * `spark.driver.maxResultSize` (1 GB) with 100× margin; the earlier
    * 5M default was multiple GB of Row overhead at the margins. The
    * distributed star path costs O(log n) rounds, so crossing over
    * earlier trades one driver job for a few bounded rounds — cheap
    * insurance at cluster scale.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
      driverThreshold: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edges.count()
    val out =
      if (n <= driverThreshold) driverUnionFind(pairs.sparkSession, edges)
      else Graph.connectedComponentsStar(edges, "id_a", "id_b", maxIter)
    edges.unpersist()
    out
  }

  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    edges.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    import spark.implicits._
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "label")
  }

  /** Survivors of a verified-pair edge list: every id that sits in a
    * connected component but is not its minimum is dropped; rows in no
    * pair survive untouched. Shared by [[nearDedup]] and
    * [[graft.ops.Similarity.semanticDedup]] so the two dedup families
    * keep identical survivor semantics. */
  def dropLosers(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__loser_id")).distinct()
    df.join(losers, col(idCol) === col("__loser_id"), "left_anti")
  }

  /** Remove near-duplicates with FULL transitive closure: verified pairs
    * are clustered via [[connectedComponents]]; only each cluster's
    * minimum id survives. */
  def nearDedup(df: DataFrame, idCol: String, shingleCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, numBands: Int = 16,
      maxBucket: Int = 1000): DataFrame =
    dropLosers(df, idCol,
      nearDupPairs(df, idCol, shingleCol, threshold, numHashes, numBands, maxBucket))

  /** Quality-aware near-dup collapse: within each connected component of
    * `pairs`, keep the row with the HIGHEST `scoreCol` (min id on ties);
    * rows in no pair survive untouched. Near-dup clusters usually hold
    * one canonical document and many degraded copies — [[nearDedup]]'s
    * min-id rule throws the best copy away whenever it isn't the oldest;
    * this variant keeps the best one (score = quality metric, length,
    * freshness…). The component map is tiny relative to the corpus
    * (pairs only), so its join back is broadcast-friendly; the per-
    * component argmax is one window over component-keyed rows. */
  def bestPerCluster(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label"))
    val joined = df.join(comp, col(idCol) === col("__cc_id"), "left")
      .withColumn("__cluster", coalesce(col("__cc_label"), col(idCol)))
    val w = Window.partitionBy(col("__cluster"))
      .orderBy(col(scoreCol).desc, col(idCol))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cluster", "__cc_id", "__cc_label")
  }

  /** SOFT dedup: keep every row, down-weight near-dup cluster members
    * instead of dropping them — `weight = scale / cluster_size` (exact
    * integer division; singletons get the full `scale`). Modern
    * pipelines often prefer this to [[nearDedup]]'s hard drop: the
    * cluster's content still appears in training at 1/cluster-size
    * effective rate, so no document is lost but boilerplate families
    * stop dominating. The integer weight feeds straight into
    * [[graft.ops.Sampling.prioritySample]] /
    * [[graft.ops.Sampling.tokenBudgetPlan]] (their integer-weight
    * contract is why `scale` exists — a rational 1/k would be refused
    * loudly there).
    *
    * Adds `cluster_id` (component min id; the row's own id for
    * singletons), `cluster_size`, and `weight`. The component map is
    * pairs-bounded — tiny relative to the corpus — so the join back is
    * broadcast-friendly; everything else is one narrow aggregate over
    * component labels. */
  def softDedupWeights(df: DataFrame, idCol: String, pairs: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"softDedupWeights: scale=$scale must be >= 1")
    val comp = connectedComponents(pairs)
    val sized = comp.join(
        comp.groupBy(col("label")).agg(count(lit(1)).as("__csize")), "label")
      .select(col("id").as("__sd_id"), col("label").as("__sd_label"),
        col("__csize"))
    df.join(sized, col(idCol) === col("__sd_id"), "left")
      .withColumn("cluster_id", coalesce(col("__sd_label"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("__csize"), lit(1L)))
      .withColumn("weight",
        org.apache.spark.sql.functions.call_function("div",
          lit(scale), col("cluster_size")))
      .drop("__sd_id", "__sd_label", "__csize")
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of token
    * hashes. Backed by a custom codegen-invoked implementation
    * ([[graft.functions.SimHashImpl]]) — the declarative `aggregate`/
    * `zip_with` formulation evaluates ~100 expressions per token; the
    * tight loop does one hash + bit-twiddles per token. */
  def simhash(toks: Column): Column = graft.functions.SimHash.simhash64(toks)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxDistance, using the
    * pigeonhole band trick: split 64 bits into (maxDistance+1) chunks —
    * any pair within distance shares at least one exact chunk, so
    * candidates come from chunk-value buckets, never O(n²).
    *
    * Pairs are generated bucket-locally (collect_list/explode) with a
    * `maxBucket` skew guard, same shape as [[minhashCandidates]] — a hot
    * chunk value (e.g. a boilerplate cluster all hashing near 0) would
    * otherwise make one bucket quadratic. NOTE: buckets larger than
    * `maxBucket` are DROPPED, trading recall inside giant boilerplate
    * clusters for bounded work — diagnose with [[Skew.keyHistogram]] on
    * the signature column and handle such clusters with exact dedup;
    * pass `maxBucket = Int.MaxValue` to forbid the tradeoff. */
  def simhashPairs(df: DataFrame, idCol: String, simhashCol: String,
      maxDistance: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(simhashCol).as("sh"))
    val chunked = base
      .withColumn("chunk", explode(sigChunks(col("sh"), maxDistance)))
      .select(struct(col("id"), col("sh")).as("item"),
        col("chunk.ci").as("ci"), col("chunk.cv").as("cv"))
    // the signature is 8 bytes, so (id, sh) rides inside the bucket list
    // and pairs come out fully-formed — no verify-time re-join (contrast
    // minhashCandidates, whose shingle payloads are too wide for this)
    chunked.groupBy(col("ci"), col("cv"))
      .agg(collect_list(col("item")).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
  }

  // --------------------------------- persisted perceptual-hash index

  /** The pigeonhole chunk array of a 64-bit signature: maxDistance+1
    * chunks of 64/(maxDistance+1) bits as (ci, cv) structs — ONE
    * definition behind [[simhashPairs]] AND the phash index probe, so
    * no two banding consumers can ever split differently. */
  private def sigChunks(sig: Column, maxDistance: Int): Column = {
    val chunks = maxDistance + 1
    require(chunks >= 1 && chunks <= 64, s"maxDistance must be in [0, 63]")
    val width = 64 / chunks
    val mask = if (width >= 64) -1L else (1L << width) - 1
    array((0 until chunks).map { c =>
      struct(lit(c).as("ci"),
        shiftrightunsigned(sig, c * width).bitwiseAND(lit(mask)).as("cv"))
    }: _*)
  }

  /** Chunk rows for a (id, ph) signature frame via [[sigChunks]]. */
  private def phashChunks(sigs: DataFrame, idName: String,
      maxDistance: Int): DataFrame =
    sigs.withColumn("chunk", explode(sigChunks(col("ph"), maxDistance)))
      .select(col("id").as(idName), col("ph").as(s"${idName}_ph"),
        col("chunk.ci").as("ci"), col("chunk.cv").as("cv"))

  /** Persist a media corpus's perceptual signatures
    * ([[graft.functions.PngDecode.dhashDecoded]] — decoded luma for
    * PNGs, bytes-as-luma otherwise) as a NEAR-dup
    * membership index: one parquet of narrow `(id, ph)` rows plus a
    * `_meta` sidecar holding `max_distance` (the banding parameter — a
    * probe reads it back so it can never band differently than the
    * writer intended). The payload decode+hash pass over the corpus is
    * paid ONCE here; each incoming batch then hashes itself and joins
    * 16-byte signature rows ([[probePhashIndex]]) — the media bytes
    * are never re-read. ~16 B/item at any corpus size, the digest-
    * index story (d12) extended from exact to perceptual membership.
    * Two-phase [[FsOps]] swap; null/undecodable payloads (null hash)
    * are excluded — they can never perceptually match anything. */
  def writePhashIndex(corpus: DataFrame, idCol: String, payloadCol: String,
      path: String, maxDistance: Int = 3): Unit =
    writePhashSignatures(
      corpus.select(col(idCol).as("id"),
        graft.functions.PngDecode.dhashDecoded(col(payloadCol)).as("ph")),
      path, maxDistance, DhashHashKind)

  /** Hash-space tag of the decoded-pixel dHash ("dhash2": PNG + JPEG
    * pixel decode feeding dhash63; the pre-JPEG build was implicitly
    * "dhash1"). Persisted in every index `_meta` and CHECKED by every
    * probe/append: the hash kind is a correctness input exactly like
    * the banding distance — a probe hashing with a different kernel
    * (or kernel version) than the writer produces disjoint signatures
    * and silently zero recall, the worst failure an admission screen
    * can have. */
  val DhashHashKind: String = "dhash2"

  /** Signature-level index build behind [[writePhashIndex]] — for
    * callers that hash with a DIFFERENT kernel sharing the 64-bit
    * signature vocabulary (the audio fingerprint,
    * [[graft.ops.Audio.writeFingerprintIndex]]). Expects `(id, ph)`;
    * null signatures are excluded — they can never perceptually match
    * anything. */
  def writePhashSignatures(sigs: DataFrame, path: String,
      maxDistance: Int, hashKind: String): Unit = {
    require(maxDistance >= 0 && maxDistance <= 63,
      s"writePhashSignatures: maxDistance $maxDistance not in [0, 63]")
    require(hashKind.nonEmpty, "writePhashSignatures: hashKind required")
    val spark = sigs.sparkSession
    val tmp = path + ".building"
    sigs.select(col("id"), col("ph")).filter(col("ph").isNotNull)
      .write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq((maxDistance, hashKind)).toDF("max_distance", "hash_kind")
      .coalesce(1).write.mode("overwrite").parquet(tmp + "/_meta")
    // a rebuild may re-band: the memoized distance invalidates around
    // the swap (before AND after — see swapDirsInvalidating's contract
    // for why both, and for the documented no-live-reader restriction)
    FsOps.swapDirsInvalidating(spark, tmp, path)(() => {
      phashMeta.remove(path); ()
    })
  }

  /** Banding distance from a phash index's `_meta`, memoized per path
    * for the life of the JVM — a streaming screen probing every
    * micro-batch pays the sidecar read once, not per batch (the
    * [[Lm.scoreWithLm]] memoization pattern). UNLIKE the LM case this
    * value is a CORRECTNESS input (probes must band with the writer's
    * distance), so [[writePhashIndex]] invalidates the entry when it
    * rebuilds the same path in this JVM; a rebuild from a DIFFERENT
    * JVM that changes the banding under a live long-running reader is
    * not supported — restart the reader (appends, the normal growth
    * path, never change the distance). Heals the swap crash window
    * before the first read (the r9 heal-before-meta class). */
  def phashIndexMaxDistance(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = phashIndexMeta(spark, path).maxDistance

  /** Persisted index parameters (banding distance + hash kind). */
  private[graft] final case class PhashIndexMeta(maxDistance: Int,
      hashKind: String)

  /** Memoized `_meta` read behind [[phashIndexMaxDistance]] and the
    * hash-kind checks. A sidecar written before hash kinds existed
    * reads back as "dhash1" (the pre-JPEG decoded hash) — which then
    * FAILS every current-kind check with the rebuild message, exactly
    * the safe outcome for an index whose signatures a current probe
    * could never match. */
  private[graft] def phashIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): PhashIndexMeta =
    phashMeta.computeIfAbsent(path, _ => {
      healPhashIndex(spark, path)
      phashMetaReads.computeIfAbsent(path,
        _ => new java.util.concurrent.atomic.AtomicLong(0L)).incrementAndGet()
      val df = spark.read.parquet(path + "/_meta")
      val row = df.collect().head
      val kind =
        if (df.schema.fieldNames.contains("hash_kind"))
          row.getString(df.schema.fieldIndex("hash_kind"))
        else "dhash1"
      PhashIndexMeta(row.getInt(df.schema.fieldIndex("max_distance")), kind)
    })

  /** Typed raise unless the index at `path` was written with
    * `expected` signatures — probing or appending across hash kinds
    * is silent zero recall, never a soft degrade. */
  private def requireHashKind(spark: org.apache.spark.sql.SparkSession,
      path: String, expected: String): Unit = {
    val actual = phashIndexMeta(spark, path).hashKind
    require(actual == expected,
      s"phash index at $path holds '$actual' signatures but this caller " +
        s"hashes '$expected' - probing/appending across hash kinds is " +
        "silent zero recall; rebuild the index with the current kernel")
  }

  /** Per-path count of actual `_meta` sidecar loads — test hook
    * pinning the once-per-path memoization contract. */
  private[graft] val phashMetaReads = new java.util.concurrent
    .ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val phashMeta =
    new java.util.concurrent.ConcurrentHashMap[String, PhashIndexMeta]()

  /** Append signature rows for a (typically already-probed) batch.
    * A replayed append lays down duplicate identical rows — probes
    * `distinct()` the index first, so replays are inert (the same
    * membership-idempotence argument as the digest index). */
  def appendToPhashIndex(batch: DataFrame, idCol: String,
      payloadCol: String, path: String): Unit =
    appendPhashSignatures(
      batch.select(col(idCol).as("id"),
        graft.functions.PngDecode.dhashDecoded(col(payloadCol)).as("ph")),
      path, DhashHashKind)

  /** Signature-level append — for callers that already hashed (the
    * streaming screen hashes once for probe + admit + append). The
    * batch's hash kind must match the index's (memoized check — one
    * sidecar read per JVM, not per batch). */
  def appendPhashSignatures(sigs: DataFrame, path: String,
      hashKind: String): Unit = {
    healPhashIndex(sigs.sparkSession, path)
    requireHashKind(sigs.sparkSession, path, hashKind)
    sigs.select(col("id"), col("ph")).filter(col("ph").isNotNull)
      .write.mode("append").parquet(path)
  }

  /** Self-heal both swap crash windows before any phash-index read or
    * append — see [[FsOps.healSwaps]] for why appends must heal first. */
  private def healPhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = FsOps.healSwaps(spark, path)

  /** Fold a phash index's per-batch appended segment files back to one
    * distinct signature set — the digest-index compaction extended to
    * perceptual membership (the lifecycle companion every other
    * persisted index family has). Under a continuous media screen
    * (e21's production shape) [[appendToPhashIndex]] lays a file per
    * micro-batch, so file counts grow without bound and every probe
    * pays the listing plus the replay-collapsing `distinct()`;
    * compaction pays that distinct ONCE. `_meta` (banding distance +
    * hash kind) is rewritten verbatim, so the per-JVM meta memo stays
    * valid and probe results are identical. Two-phase sibling-dir
    * swap; the crash window heals at every read/append entry point.
    *
    * NOT concurrent-WRITER-safe (same contract as
    * [[graft.ops.Similarity.compactJlIndex]]): an append landing between
    * this compaction's read and its swap is deleted with the old
    * directory — quiesce writers first (stop the stream, or compact from
    * inside its own foreachBatch thread where batches serialize).
    * Readers are safe throughout. */
  def compactPhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    healPhashIndex(spark, path)
    val meta = phashIndexMeta(spark, path)
    val tmp = path + ".compacting"
    spark.read.parquet(path).select(col("id"), col("ph")).distinct()
      .write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq((meta.maxDistance, meta.hashKind)).toDF("max_distance", "hash_kind")
      .coalesce(1).write.mode("overwrite").parquet(tmp + "/_meta")
    FsOps.swapDirs(spark, tmp, path)
  }

  /** Probe a batch of payloads against a [[writePhashIndex]] index:
    * `(batch_id, index_id, hamming)` for every batch item within the
    * index's `max_distance` of an index signature — re-encoded /
    * slightly-corrupted copies of indexed media surface here where
    * exact digests miss them. Candidates come from the pigeonhole band
    * join (an over-distance pair never shares a chunk → never joins);
    * `maxBucket` drops hot (ci, cv) buckets (boilerplate media all
    * hashing alike) at a documented recall trade, same contract as
    * [[simhashPairs]] — pass `Int.MaxValue` to forbid. Singleton
    * buckets are KEPT (a probe can match a lone indexed item —
    * contrast simhashPairs' in-corpus `between(2, …)`). */
  def probePhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, payloadCol: String,
      maxBucket: Int = 1000): DataFrame =
    // cut: the signature frame feeds two probe subtrees (the broadcast
    // chunk-key prune and the pair join) and Catalyst does not CSE
    // across the exchange — without the cut every payload would be
    // decoded+hashed twice, the exact cost the index exists to avoid
    // (the 16-byte cut output is batch-sized; the streaming screen
    // persists its own hashed frame for the same reason)
    probePhashSignatures(spark, path,
      Lineage.cut(batch.select(col(idCol).as("id"),
        graft.functions.PngDecode.dhashDecoded(col(payloadCol)).as("ph"))),
      DhashHashKind, maxBucket)

  /** Signature-level probe behind [[probePhashIndex]]; `hashKind`
    * names the kernel that produced `sigs` and must match the
    * writer's. */
  def probePhashSignatures(spark: org.apache.spark.sql.SparkSession,
      path: String, sigs: DataFrame, hashKind: String,
      maxBucket: Int = 1000): DataFrame =
    probePhashSignaturesAt(spark, path, sigs,
      phashIndexMaxDistance(spark, path), maxBucket, hashKind)

  /** Probe with the banding distance supplied by the caller — for
    * callers that already hold the distance (the streaming screen gets
    * it once per JVM from the memoized [[phashIndexMaxDistance]] and
    * must band its in-batch dominance pass with the SAME distance the
    * index probe uses; two independent lookups could otherwise
    * disagree across an index rebuild).
    *
    * Plan shape: the batch's DISTINCT (ci, cv) chunk values broadcast
    * as a semi-join over the index's chunk rows FIRST, so the bucket-
    * size aggregate and the pair join run over only the buckets this
    * batch touches — one narrow shuffle over the index (the distinct
    * that collapses replayed appends) instead of three (probe-side
    * 6M-signature measurement: 80 s → 39 s). Touched-bucket sizes
    * are still TRUE sizes (the semi keeps whole buckets), so the
    * maxBucket cap semantics are unchanged. The prune only engages
    * for chunk widths ≤ 16 bits (maxDistance ≥ 3): at width 32/64
    * (maxDistance ≤ 1) distinct chunk values scale with BATCH size,
    * not the key space, and the explicit broadcast hint (which
    * bypasses the size threshold) could OOM on a huge batch. */
  private[graft] def probePhashSignaturesAt(
      spark: org.apache.spark.sql.SparkSession, path: String,
      sigs: DataFrame, maxDistance: Int, maxBucket: Int,
      hashKind: String): DataFrame = {
    healPhashIndex(spark, path)
    requireHashKind(spark, path, hashKind) // memoized: one read per JVM
    val bc = phashChunks(sigs.filter(col("ph").isNotNull), "batch_id",
      maxDistance)
    // distinct: replayed appends collapse (16-byte rows)
    val idxAll = phashChunks(spark.read.parquet(path).distinct(), "index_id",
      maxDistance)
    val idx =
      if (64 / (maxDistance + 1) <= 16)
        idxAll.join(broadcast(bc.select(col("ci"), col("cv")).distinct()),
          Seq("ci", "cv"), "left_semi")
      else idxAll
    val sizes = idx.groupBy(col("ci"), col("cv"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
    bc.join(idx.join(sizes, Seq("ci", "cv")).drop("__bn"), Seq("ci", "cv"))
      .withColumn("hamming", hamming(col("batch_id_ph"), col("index_id_ph")))
      .filter(col("hamming") <= maxDistance)
      .select(col("batch_id"), col("index_id"), col("hamming"))
      .dropDuplicates("batch_id", "index_id")
  }

  /** NEAR-DUP-aware set diff of two persisted [[writePhashIndex]]
    * snapshots: one row `(n_added, n_removed, n_retained)` where item
    * identity is PERCEPTUAL — a v2 item counts as retained if ANY v1
    * item sits within the banding distance, so a re-encoded /
    * lightly-corrupted copy of an existing doc reports as retained
    * where [[diffDigestIndexes]] (the exact-digest floor) would count
    * it as one removal plus one addition. `n_added` = v2 items with no
    * near-dup in v1; `n_removed` = v1 items with none in v2;
    * `n_retained` counts on the v2 side. Ids never cross snapshots
    * (a re-crawl mints new ids) — matching is by signature alone.
    *
    * Shape: both signature sets `distinct()` (replayed appends
    * collapse), pigeonhole-chunked, ONE band equi-join on (ci, cv) +
    * the hamming verify — exhaustive at ≤ maxDistance, never
    * all-pairs. The narrow matched-id pair set is lineage-cut (16-byte
    * rows; it feeds both per-side membership counts, and Catalyst
    * would re-run the join per consumer — note the cut makes this call
    * EAGER). Counts then run as the d13-style union-marker aggregate —
    * (side, id) distinct → per-side counts → one pivot row — so there
    * is no join on ids (null ids survive, the r6 class) and no 1-row
    * cross joins. An item is its id: an id re-appended with a changed
    * signature counts once, matched if ANY of its signatures matches.
    * Unlike the batch probe there is no broadcast chunk prune: a
    * corpus-scale diff touches nearly every bucket of the bounded
    * (ci, cv) key space on both sides, so the prune would spend its
    * aggregate without shrinking the shuffle (it wins when one side is
    * a small batch — that case IS [[probePhashSignaturesAt]]).
    *
    * Both snapshots must band with the SAME distance (typed raise
    * otherwise — a mixed-distance band join would silently miss
    * pairs); `maxBucket` defaults to UNLIMITED because a churn REPORT
    * must not silently bias toward "added" on hot buckets (the
    * [[probePhashIndex]] recall contract), at the documented hot-
    * bucket join cost. */
  def diffPhashIndexes(spark: org.apache.spark.sql.SparkSession,
      pathV1: String, pathV2: String,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val k1 = phashIndexMeta(spark, pathV1).hashKind
    val k2 = phashIndexMeta(spark, pathV2).hashKind
    require(k1 == k2, s"diffPhashIndexes: snapshots hold different hash " +
      s"kinds ('$k1' vs '$k2') - their signatures are incomparable; " +
      "rebuild one side with the other's kernel")
    val d1 = phashIndexMaxDistance(spark, pathV1)
    val d2 = phashIndexMaxDistance(spark, pathV2)
    require(d1 == d2, s"diffPhashIndexes: snapshots band at different " +
      s"distances ($d1 vs $d2) — rebuild one with the other's maxDistance")
    // heal before the snapshot reads: the memoized getter only heals on
    // a memo MISS, so with a hot memo a crashed swap would otherwise
    // fail every diff until restart even though `.building` is complete
    healPhashIndex(spark, pathV1)
    healPhashIndex(spark, pathV2)
    // cut after the distinct: each side feeds the band join AND the
    // membership-count union (and a third bucket-size self-join when
    // maxBucket is finite) — Catalyst would re-run the scan + distinct
    // per consumer; the cut output is 16-byte signature rows
    val v1 = Lineage.cut(spark.read.parquet(pathV1).distinct())
    val v2 = Lineage.cut(spark.read.parquet(pathV2).distinct())
    def capped(ch: DataFrame): DataFrame =
      if (maxBucket == Int.MaxValue) ch
      else ch.join(ch.groupBy(col("ci"), col("cv"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= maxBucket)
          .drop("__bn"), Seq("ci", "cv"))
    val pairs = capped(phashChunks(v1, "a", d1))
      .join(capped(phashChunks(v2, "b", d1)), Seq("ci", "cv"))
      .filter(hamming(col("a_ph"), col("b_ph")) <= d1)
      .select(col("a"), col("b"))
    val matched = Lineage.cut(pairs.distinct())
    def side(df: DataFrame, idC: String, s: String) =
      df.select(lit(s).as("side"), col(idC).as("id"))
    val perSide = side(v1, "id", "v1").unionByName(side(v2, "id", "v2"))
      .unionByName(side(matched, "a", "m1"))
      .unionByName(side(matched, "b", "m2"))
      .distinct()
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
    def n(s: String) = // empty side → no row → NULL max (the r8 class)
      coalesce(max(when(col("side") === s, col("n"))), lit(0L))
    perSide.agg(
      (n("v2") - n("m2")).as("n_added"),
      (n("v1") - n("m1")).as("n_removed"),
      n("m2").as("n_retained"))
  }

  // ------------------------------------------------ persisted LSH index

  /** Banded signature rows (id, band, bh) for an (id, shingles) frame —
    * one fused kernel call per row ([[graft.functions.MinHashImpl
    * .bandHashes]]: signature + per-band xxhash64 fold, bit-identical
    * to the former `xxhash64(slice(sig, …))` formulation on non-null
    * input, pinned by `KernelParitySpec`). Deliberate deviation: a
    * NULL shingles column now emits NO band rows (propagateNull) —
    * the old form emitted bh = 42 for every band, funneling ALL
    * null-shingle docs into one giant bucket, the exact skew hazard
    * `maxBucket` exists to guard. */
  private def bandRows(base: DataFrame, numHashes: Int, numBands: Int): DataFrame =
    base.select(col("id"), posexplode(
        graft.functions.MinHash.bandHashes(col("shingles"), numHashes, numBands)))
      .toDF("id", "band", "bh")

  /** Persist a corpus's MinHash LSH state so CONTINUOUS INGEST never
    * re-reads the corpus: `path/bands` holds the narrow banded
    * signature rows (id, band, bh, bucket_n), `path/docs` the per-doc
    * verification shingles, `path/meta` the banding parameters (so a
    * probe can't silently band differently). The shingle + signature
    * pass over the corpus — the expensive part at 100 TB — is paid
    * ONCE here; each incoming batch then probes band buckets
    * ([[probeMinhashIndex]]) and verifies only its candidates.
    *
    * `bucket_n` is each (band, bh) bucket's corpus-side size, computed
    * at write time, so probes can skip boilerplate mega-buckets without
    * re-aggregating the index. [[appendToMinhashIndex]] counts only
    * within the appended segment; one meta row is recorded per segment,
    * and [[probeMinhashIndex]] sums the per-segment counts whenever more
    * than one segment exists — the skew guard stays exact across the
    * index's whole lifetime. [[compactMinhashIndex]] folds everything
    * back into one globally-counted segment. */
  def writeMinhashIndex(corpus: DataFrame, idCol: String, shingleCol: String,
      path: String, numHashes: Int = 64, numBands: Int = 16): Unit = {
    val base = corpus.select(col(idCol).as("id"), col(shingleCol).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counted = bandRows(base, numHashes, numBands)
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .withColumn("segment", lit("base"))
    counted.write.mode("overwrite").parquet(path + "/bands")
    base.write.mode("overwrite").parquet(path + "/docs")
    writeMeta(corpus.sparkSession, path, numHashes, numBands, "base",
      overwrite = true)
    base.unpersist()
    ()
  }

  /** One meta row per segment: (num_hashes, num_bands, segment). The
    * banding parameters are identical on every row; the ROW COUNT tells
    * probes whether per-segment `bucket_n` values are still global. */
  private def writeMeta(spark: org.apache.spark.sql.SparkSession, path: String,
      numHashes: Int, numBands: Int, segment: String, overwrite: Boolean): Unit = {
    import spark.implicits._
    Seq((numHashes, numBands, segment)).toDF("num_hashes", "num_bands", "segment")
      .coalesce(1).write.mode(if (overwrite) "overwrite" else "append")
      .parquet(path + "/meta")
  }

  /** Append a (typically already-cleaned) batch to a
    * [[writeMinhashIndex]] index, banding with the index's own stored
    * parameters. `bucket_n` for the appended rows counts within this
    * segment only; the extra meta row makes [[probeMinhashIndex]]
    * re-aggregate totals across segments (see [[writeMinhashIndex]]). */
  def appendToMinhashIndex(batch: DataFrame, idCol: String,
      shingleCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    healIndex(spark, path)
    val meta = spark.read.parquet(path + "/meta").collect().head
    val (numHashes, numBands) = (meta.getInt(0), meta.getInt(1))
    val segment = java.util.UUID.randomUUID().toString
    val base = batch.select(col(idCol).as("id"), col(shingleCol).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandRows(base, numHashes, numBands)
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .withColumn("segment", lit(segment))
      .write.mode("append").parquet(path + "/bands")
    base.write.mode("append").parquet(path + "/docs")
    writeMeta(spark, path, numHashes, numBands, segment, overwrite = false)
    base.unpersist()
    ()
  }

  /** Rewrite a multi-segment index as one segment with globally exact
    * `bucket_n` — restores single-scan probes (no cross-segment
    * re-aggregation) after heavy append traffic. Band rows are narrow
    * (id, band, bh), so this is one window shuffle over the index, never
    * a re-shingling of the corpus. */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    healIndex(spark, path)
    val meta = spark.read.parquet(path + "/meta").collect().head
    val (numHashes, numBands) = (meta.getInt(0), meta.getInt(1))
    // two-phase swap, never overwrite-in-place: the compacted copy is
    // fully written to a sibling dir FIRST (plain lineage from the old
    // files — no checkpoint whose executor-local blocks could strand a
    // half-overwritten index), then swapped in with a filesystem rename.
    // Worst crash window (after delete, before rename) leaves the
    // complete compacted copy at bands.compacting — recoverable by
    // renaming it; the index data is never the only casualty.
    val tmpPath = path + "/bands.compacting"
    spark.read.parquet(path + "/bands")
      .select(col("id"), col("band"), col("bh"))
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .withColumn("segment", lit("base"))
      .write.mode("overwrite").parquet(tmpPath)
    FsOps.swapDirs(spark, tmpPath, path + "/bands")
    // the meta rewrite follows the SAME two-phase discipline: a plain
    // mode("overwrite") deletes before it writes, so a crash mid-rewrite
    // would lose num_hashes/num_bands and strand the whole index — the
    // exact in-place hazard FsOps exists to avoid, just on a tiny dir
    import spark.implicits._
    Seq((numHashes, numBands, "base")).toDF("num_hashes", "num_bands", "segment")
      .coalesce(1).write.mode("overwrite").parquet(path + "/meta.compacting")
    FsOps.swapDirs(spark, path + "/meta.compacting", path + "/meta")
    ()
  }

  /** Self-heal both swap-maintained index dirs before a read: recovers
    * the delete→rename crash window of [[compactMinhashIndex]] for
    * `bands` and `meta` alike (no-op when both dirs are intact). */
  private def healIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    FsOps.healSwap(spark, path + "/bands.compacting", path + "/bands")
    FsOps.healSwap(spark, path + "/meta.compacting", path + "/meta")
  }

  /** Incremental near-dedup: find (batch_id, corpus_id, jaccard) pairs
    * between a new batch and a [[writeMinhashIndex]]-persisted corpus,
    * WITHOUT touching the corpus text — candidates come from an
    * equi-join of the batch's band rows against the stored band rows,
    * and exact-Jaccard verification joins shingles for the (small)
    * candidate set only. The incremental analogue of [[nearDupPairs]]:
    * at 100 TB the per-batch cost is one pass over the BATCH plus a
    * narrow hash join against the index — the corpus is never
    * re-shingled.
    *
    * @param maxBucket corpus buckets larger than this are skipped — the
    *        boilerplate-cluster skew guard, same trade as
    *        [[minhashCandidates]]. On a single-segment index the
    *        write-time `bucket_n` is used directly; after appends
    *        (multiple meta rows) per-segment counts are summed per
    *        (band, bh) first, so a bucket that crossed `maxBucket`
    *        ACROSS segments is still skipped in full. */
  def probeMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, idCol: String, shingleCol: String,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    healIndex(spark, indexPath)
    val metaRows = spark.read.parquet(indexPath + "/meta").collect()
    val meta = metaRows.head
    val (numHashes, numBands) = (meta.getInt(0), meta.getInt(1))
    val b = batch.select(col(idCol).as("id"), col(shingleCol).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = spark.read.parquet(indexPath + "/bands")
    val sized =
      if (metaRows.length <= 1) bands.filter(col("bucket_n") <= maxBucket)
      else {
        // cross-segment totals: one value per (band, bh, segment) — the
        // per-segment count repeats on every row of its bucket — summed
        // per bucket. Oversized buckets are few (≤ rows/maxBucket), so
        // the anti join's build side stays small.
        val oversized = bands
          .groupBy(col("band"), col("bh"), col("segment"))
          .agg(first(col("bucket_n")).as("seg_n"))
          .groupBy(col("band"), col("bh"))
          .agg(sum(col("seg_n")).as("total_n"))
          .filter(col("total_n") > maxBucket)
          .select(col("band"), col("bh"))
        bands.join(oversized, Seq("band", "bh"), "left_anti")
      }
    val cand = sized
      .select(col("id").as("corpus_id"), col("band"), col("bh"))
      .join(bandRows(b, numHashes, numBands)
        .select(col("id").as("batch_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("corpus_id") =!= col("batch_id"))
      .select(col("batch_id"), col("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    val docs = spark.read.parquet(indexPath + "/docs")
      .select(col("id").as("corpus_id"), col("shingles").as("c_sh"))
    val verified = cand
      .join(docs, Seq("corpus_id"))
      .join(b.select(col("id").as("batch_id"), col("shingles").as("b_sh")),
        Seq("batch_id"))
      .withColumn("jaccard", jaccard(col("b_sh"), col("c_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
    // verified pairs are small by construction — materialize so the
    // batch cache can be released (same rationale as minhashCandidates)
    val cut = Lineage.cut(verified)
    b.unpersist()
    cut
  }
}
