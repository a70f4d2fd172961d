package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: blocked fuzzy join on string keys, exhaustive at a
  * bounded edit distance, never all-pairs.
  *
  * Blocking scheme = the symmetric-delete ("SymSpell") neighborhood: two
  * strings with Levenshtein distance ≤ d always share at least one common
  * member of their ≤ d-deletion neighborhoods (delete up to d characters
  * in every position combination; the original string is a member at
  * depth 0). So exploding each side into its deletion variants and
  * equi-joining on the variant yields a candidate set with ZERO recall
  * loss at ≤ d — the Levenshtein verification afterwards only removes
  * false positives. Candidate volume per row is O(len^d), independent of
  * corpus size: at 100 TB this is a plain hash equi-join on 8-byte keys
  * (variants are xxhash64'd before the shuffle — a hash collision can
  * only ADD a candidate, never drop one, and the verify step removes it),
  * vs the quadratic blow-up of a naive distance cross join. Same design
  * family as the minhash/simhash/phash banding joins (`Dedup.minhashPairs`,
  * `Multimodal.phashPairs`): pigeonhole-complete candidates + exact verify.
  *
  * Distance semantics: plain Levenshtein (insert/delete/substitute, unit
  * cost), counted over CODEPOINTS — both Spark's `levenshtein` and the
  * DuckDB oracle's agree on that; fold non-BMP/confusable text first
  * (the t05 precedent) if byte-level agreement is required. NULL keys on
  * either side never match (SQL comparison semantics); rows carrying them
  * are dropped from the join, not errored.
  *
  * Skew note: a pathologically hot variant key (e.g. the empty string at
  * depth ≥ len, or a very common short name) multiplies candidates.
  * `maxBucket` caps the RIGHT-side bucket size, mirroring
  * `Dedup.simhashPairs`: buckets above the cap are dropped from the
  * candidate generation, which TRADES RECALL for boundedness — the
  * default keeps every bucket, and droppers must opt in knowingly.
  */
object FuzzyJoin {

  /** Deletion neighborhood of a string column: all strings obtainable by
    * deleting up to `depth` characters (the string itself included),
    * de-duplicated. `array<string>`; NULL in → NULL out.
    *
    * Pure Column composition (stays inside whole-stage codegen). The
    * inner `sequence(0, len-1)` is guarded for empty strings — Spark's
    * `sequence(0, -1)` counts DOWN (the round-8 lesson), so the empty
    * string maps to just `[""]`.
    */
  def deleteVariants(s: Column, depth: Int): Column = {
    require(depth >= 0, s"deleteVariants depth must be >= 0, got $depth")
    def oneDelete(v: Column): Column =
      when(length(v) >= 1,
        transform(sequence(lit(0), length(v) - 1),
          i => concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v)))))
        .otherwise(array().cast("array<string>"))
    // null input stays null through every level (transform/concat propagate)
    var acc = when(s.isNotNull, array(s))
    var d = 0
    while (d < depth) {
      // each level references the previous neighborhood TWICE (kept + the
      // flatten source): bind it once per level or the O(len^d) array is
      // re-evaluated 2^depth-fold (HOFs block CSE — the bindOnce class)
      acc = Dedup.bindOnce(acc) { a =>
        array_distinct(concat(a, flatten(transform(a, oneDelete(_)))))
      }
      d += 1
    }
    acc
  }

  /** Blocked fuzzy equi-join: every (left, right) row pair whose key
    * strings are within Levenshtein distance `maxDist`, found via the
    * deletion-neighborhood blocking above (exhaustive at ≤ `maxDist`).
    *
    * Output columns: `<leftId>`, `<leftKey>`, `<rightId>`, `<rightKey>`,
    * `dist` (int). One row per distinct (id, key) pair combination —
    * duplicate (id, key) input rows collapse, which is what an entity
    * matcher wants (the verify is on values, not multiplicities).
    *
    * @param maxBucket drop variant buckets whose RIGHT side exceeds this
    *                  many rows — bounded-candidates guard that LOSES
    *                  recall on hot keys; default keeps everything.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, maxBucket: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 0, s"fuzzyJoin maxDist must be >= 0, got $maxDist")
    val outNames = Seq(leftId, leftKey, rightId, rightKey, "dist")
    require(outNames.distinct.size == outNames.size,
      s"fuzzyJoin output columns $outNames must be distinct — rename a " +
        "side's id/key (and avoid 'dist') before joining, or the result " +
        "carries ambiguous duplicate columns")
    val lv = left.select(col(leftId).as("__lid"), col(leftKey).as("__lk"))
      .filter(col("__lk").isNotNull).distinct()
      .select(col("__lid"), col("__lk"),
        explode(deleteVariants(col("__lk"), maxDist)).as("__v"))
      .select(col("__lid"), col("__lk"), xxhash64(col("__v")).as("__h"))
      .distinct() // several deletion positions can yield one variant
    val rvAll = right.select(col(rightId).as("__rid"), col(rightKey).as("__rk"))
      .filter(col("__rk").isNotNull).distinct()
      .select(col("__rid"), col("__rk"),
        explode(deleteVariants(col("__rk"), maxDist)).as("__v"))
      .select(col("__rid"), col("__rk"), xxhash64(col("__v")).as("__h"))
      .distinct()
    val rv =
      if (maxBucket == Long.MaxValue) rvAll
      else {
        // hot-bucket guard: one aggregate on the 8-byte key, then a
        // broadcast-able semi filter (hot keys are few by definition)
        val hot = rvAll.groupBy("__h").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket).select("__h")
        rvAll.join(broadcast(hot), Seq("__h"), "left_anti")
      }
    lv.join(rv, Seq("__h"))
      .select(col("__lid"), col("__lk"), col("__rid"), col("__rk"))
      .distinct() // pairs sharing several variants collapse before verify
      .withColumn("dist", levenshtein(col("__lk"), col("__rk")))
      .filter(col("dist") <= maxDist)
      .select(col("__lid").as(leftId), col("__lk").as(leftKey),
        col("__rid").as(rightId), col("__rk").as(rightKey), col("dist"))
  }

  // ------------------- persisted deletion-variant index (entity serving)

  /** The continuous-entity-matching shape: the entity catalog's deletion
    * variants are exploded, hashed and persisted ONCE; each incoming
    * batch explodes only ITS OWN variants and equi-joins the stored
    * ones — the catalog is never re-exploded per batch. Index rows are
    * `(h: long, id, name)` (the name rides along for the exact verify;
    * parquet dictionary encoding collapses the per-variant repetition).
    * `_meta` pins the build depth: a probe at `maxDist` needs BOTH
    * sides' neighborhoods at depth ≥ maxDist for the pigeonhole
    * guarantee, so probing deeper than the stored depth is a TYPED
    * error — serving it anyway would silently zero recall on the
    * far pairs (the hash-space-versioning lesson).
    */
  private def variantRows(df: DataFrame, idCol: String, keyCol: String,
      depth: Int): DataFrame =
    df.select(col(idCol).as("id"), col(keyCol).as("name"))
      .filter(col("name").isNotNull).distinct()
      .select(col("id"), col("name"),
        explode(deleteVariants(col("name"), depth)).as("__v"))
      .select(xxhash64(col("__v")).as("h"), col("id"), col("name"))
      .distinct()

  /** Per-JVM memo of the stored depth — a probe-per-micro-batch loop
    * must not pay a parquet sidecar read per batch (the JL/phash memo
    * precedent). Depth is a CORRECTNESS input: [[writeFuzzyIndex]] and
    * [[compactFuzzyIndex]] invalidate around their swaps; cross-JVM
    * rebuilds under a live reader need a reader restart (same
    * documented caveat as the phash banding distance). */
  private val depthCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Per-JVM memo of the stored data schema (footer read lists the whole
    * index dir — a per-micro-batch append must not pay a listing that
    * grows with every batch it appends). Invariant between swaps;
    * invalidated together with [[depthCache]]. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def invalidate(path: String): Unit = {
    depthCache.remove(path)
    schemaCache.remove(path)
    ()
  }

  /** Build the index at `path` (two-phase `.building` swap — readers
    * see the old index or the new one, never a mix). */
  def writeFuzzyIndex(entities: DataFrame, idCol: String, keyCol: String,
      depth: Int, path: String): Unit = {
    require(depth >= 1, s"writeFuzzyIndex depth must be >= 1, got $depth")
    val spark = entities.sparkSession
    FsOps.healSwaps(spark, path)
    val tmp = path + ".building"
    variantRows(entities, idCol, keyCol, depth)
      .write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq(depth).toDF("depth").coalesce(1)
      .write.mode("overwrite").parquet(tmp + "/_meta")
    FsOps.swapDirsInvalidating(spark, tmp, path)(() => invalidate(path))
  }

  /** Stored build depth — heals both swap crash windows first (append
    * into an un-healed window would recreate a bare dir and strand the
    * complete copy; the round-12 heal-before-append rule). Missing
    * sidecar = typed rebuild message, not a guessed depth. */
  def readFuzzyMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
    depthCache.computeIfAbsent(path, _ => readFuzzyMetaUncached(spark, path))

  private def readFuzzyMetaUncached(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    FsOps.healSwaps(spark, path)
    val metaPath = new org.apache.hadoop.fs.Path(path + "/_meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath))
      throw new IllegalStateException(
        s"fuzzy index at $path has no _meta sidecar — rebuild it with " +
          "writeFuzzyIndex (probing under a guessed depth would silently " +
          "zero recall past the true one)")
    val rows = spark.read.parquet(path + "/_meta").select("depth").collect()
    require(rows.length == 1,
      s"fuzzy index _meta at $path must be 1 row, got ${rows.length}")
    rows(0).getInt(0)
  }

  /** Match a batch against the stored catalog: all (batch, entity)
    * pairs within Levenshtein `maxDist` — exhaustive, because the
    * batch explodes at depth `maxDist` and the index was built at
    * depth ≥ `maxDist` (enforced). Output: `<batchId>`, `<batchKey>`,
    * `entity_id`, `entity_name`, `dist`.
    *
    * A small batch (the streaming-ingest norm) broadcasts its variant
    * rows, so the index scan never shuffles — the r9 batch-chunk
    * broadcast prune applied to entity matching. `broadcastBatch` is a
    * caller contract rather than a measured threshold (a size-probe
    * count job per probe dominates small-batch serving cost): keep the
    * default for batches up to ~30k distinct names (≈ a few M narrow
    * variant rows), pass false for bulk backfills — they fall back to
    * a plain shuffled hash join on the 8-byte key.
    */
  def probeFuzzyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, batchId: String, batchKey: String,
      maxDist: Int, broadcastBatch: Boolean = true): DataFrame = {
    // heal EVERY entry, not just cache-miss meta reads — an append or
    // probe inside another process's crashed swap window would recreate
    // a bare dir and strand the complete copy (the round-12 rule); when
    // the index dir exists this is one fs existence check
    FsOps.healSwaps(spark, path)
    val depth = readFuzzyMeta(spark, path)
    require(maxDist <= depth,
      s"probe maxDist=$maxDist exceeds the index build depth=$depth at " +
        s"$path — matches past depth $depth would be silently missed; " +
        "rebuild the index at the deeper setting")
    val bv = variantRows(batch, batchId, batchKey, maxDist)
      .withColumnRenamed("id", "__bid").withColumnRenamed("name", "__bname")
    val idx = spark.read.parquet(path)
    idx.join(if (broadcastBatch) broadcast(bv) else bv, Seq("h"))
      .select(col("__bid"), col("__bname"), col("id"), col("name"))
      .distinct()
      .withColumn("dist", levenshtein(col("__bname"), col("name")))
      .filter(col("dist") <= maxDist)
      .select(col("__bid").as(batchId), col("__bname").as(batchKey),
        col("id").as("entity_id"), col("name").as("entity_name"), col("dist"))
  }

  /** Add new entities (typically a probe's unmatched remainder, admitted
    * as novel) at the STORED depth. Appends may duplicate (h, id, name)
    * rows across segments — probes de-duplicate pairs before the verify,
    * so correctness is unaffected; [[compactFuzzyIndex]] re-distincts. */
  def appendToFuzzyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, entities: DataFrame, idCol: String,
      keyCol: String): Unit = {
    FsOps.healSwaps(spark, path) // heal-before-append, every call
    val depth = readFuzzyMeta(spark, path)
    val stored = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val rows = variantRows(entities, idCol, keyCol, depth)
    // align the appended id/name types to the STORED footer schema — mixed
    // int32/int64 id footers in one index break the next vectorized read
    // (the writeJlIndex cast-to-array<double> hazard); widening casts are
    // applied, anything lossy (long id into an int index, non-string key)
    // is a typed error telling the caller to rebuild wider
    val aligned = rows.select(stored.fields.map { f =>
      val from = rows.schema(f.name).dataType
      if (from == f.dataType) col(f.name)
      else if (org.apache.spark.sql.catalyst.expressions.Cast
          .canUpCast(from, f.dataType)) col(f.name).cast(f.dataType)
      else throw new IllegalStateException(
        s"appendToFuzzyIndex: column '${f.name}' has type $from but the " +
          s"index at $path stores ${f.dataType} and the cast is lossy — " +
          "rebuild the index with writeFuzzyIndex at the wider type")
    }.toIndexedSeq: _*)
    aligned.write.mode("append").parquet(path)
  }

  /** Fold append segments back to one distinct variant set (two-phase
    * `.compacting` swap; `_meta` rewritten verbatim). Output file count
    * targets ~96 MB per file but never drops below the cluster's scan
    * parallelism while there are ≥ ~16 MB per task to scan: a compacted
    * file's single large row group is the smallest possible split, so
    * folding a 250 MB index to 2 files was MEASURED to collapse probe
    * parallelism 5× — layout compaction must not cost scan concurrency. */
  def compactFuzzyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    FsOps.healSwaps(spark, path)
    val depth = readFuzzyMeta(spark, path)
    val tmp = path + ".compacting"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(root).getLength
    val par = spark.sparkContext.defaultParallelism.toLong
    val nFiles = math.max(bytes / (96L << 20),
      math.max(1L, math.min(par, bytes / (16L << 20)))).toInt
    spark.read.parquet(path).distinct().repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    Seq(depth).toDF("depth").coalesce(1)
      .write.mode("overwrite").parquet(tmp + "/_meta")
    FsOps.swapDirsInvalidating(spark, tmp, path)(() => invalidate(path))
  }
}
