package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Relevance-ranking operators for training-data pipelines: TF-IDF
  * weights and BM25 scoring — the workhorses behind corpus search,
  * query-focused subset selection, and per-source relevance filters.
  *
  * Scale shape (the 100 TB story): tokenize → explode → filter to the
  * query's terms BEFORE any aggregate, so candidate volume is
  * docs-containing-a-query-term rather than the corpus vocabulary; the
  * per-term document-frequency table is tiny (≤ |query| rows) and
  * broadcast; per-term partial scores are summed as DECIMAL(18,12) so
  * the per-doc aggregate is order-independent under any parallelism
  * (the suite-wide double-aggregate rule — see CLAUDE.md).
  */
object Ranking {

  /** (doc_id, term, tf) term frequencies over lower-cased whitespace
    * tokens. One explode + one hash aggregate with map-side combine. */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Per-(doc, term) TF-IDF weights: tf · ln(N / df). The document-
    * frequency side is an aggregate of the same exploded table; N rides
    * along as a broadcast 1-row cross join (no driver-side count). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreqs(df, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = broadcast(df.agg(count(lit(1)).as("n_docs")))
    tf.join(dfreq, "term").crossJoin(total)
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df")))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 relevance of every matching document to a bag of query terms.
    * Returns (doc_id, bm25) for documents containing ≥1 query term.
    * Null-text documents are excluded from the corpus statistics — the
    * SAME exclusion [[writePostingsIndex]] applies, so index-served
    * scores stay bitwise identical to this scan on any corpus.
    *
    * `logIdf = true` (default) is classic BM25:
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)). `logIdf = false` drops the
    * ln — per-term order-preserving, and because every remaining op is
    * rational double arithmetic on integer inputs, the scores are
    * bit-for-bit reproducible by an independent engine (libm
    * transcendentals are not guaranteed to the last ulp); the
    * oracle-checked gate uses this variant.
    *
    * The per-doc sum runs over DECIMAL(18,12) partial scores, so the
    * result is identical under any partitioning/ordering.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("tk"))
    // corpus passes: ONE aggregate for (N, Σdl) + ONE explode for tf —
    // the doc length rides along through the tf aggregate (constant per
    // doc, so max() is exact) instead of a third tokenize + shuffle join
    val totals = broadcast(
      toks.agg(count(lit(1)).as("n_docs"), sum(size(col("tk"))).as("total_dl")))
    val tf = toks.select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
    // expression order mirrors the oracle SQL exactly — left-assoc
    // (idf * num) / den — so the doubles match bitwise cross-engine
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    val ratio = (col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + ratio) else ratio
    val num = col("tf").cast("double") * (lit(k1) + lit(1.0))
    val den = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    tf.join(dfreq, "term").crossJoin(totals)
      .withColumn("term_score", (idf * num / den).cast("decimal(18,12)"))
      .groupBy(col("doc_id")).agg(sum(col("term_score")).as("score_dec"))
      .select(col("doc_id"), col("score_dec").cast("double").as("bm25"))
  }

  // -------------------------------------------- persisted postings index

  /** Persist an inverted (postings) index for BM25 serving: the corpus
    * is tokenized ONCE at write time (cached across the two writes —
    * never re-scanned for the stats); a query then touches only its own
    * terms' postings, never the corpus text again. Layout at `path`:
    * postings rows `(term, doc_id, tf, dl)` range-partitioned and
    * sorted by term (each parquet file covers a contiguous term range,
    * so a term-set query prunes to a handful of files by footer
    * min/max), plus a `_meta` sidecar `(n_docs, total_dl)` — the only
    * corpus-level stats BM25 needs. Per-term document frequency is NOT
    * stored: [[queryPostingsIndex]] recomputes it from the pruned
    * postings it reads anyway, so there is no df sidecar to go stale.
    * Built in a sibling dir and swapped in with the two-phase [[FsOps]]
    * discipline (readers see old or new, never a mix). Null-text docs
    * are excluded — the SAME exclusion [[bm25]] applies, keeping
    * served ≡ scanned bitwise on any corpus. */
  def writePostingsIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, numFiles: Int = 32): Unit = {
    val spark = docs.sparkSession
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .persist()
    try {
      val tmp = path + ".building"
      toks.select(col("doc_id"), size(col("tk")).as("dl"),
          explode(col("tk")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))
        .repartitionByRange(numFiles, col("term"), col("doc_id"))
        .sortWithinPartitions(col("term"), col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      toks.agg(count(lit(1)).as("n_docs"), sum(size(col("tk"))).as("total_dl"))
        .coalesce(1).write.mode("overwrite").parquet(tmp + "/_meta")
      FsOps.swapDirs(spark, tmp, path)
    } finally toks.unpersist()
  }

  /** Append a document batch to a [[writePostingsIndex]] index without
    * rebuilding: the batch's postings land as new files (term-range
    * pruning degrades gracefully — footer min/max still bounds each
    * file, there are just more candidate files per term until
    * [[compactPostingsIndex]]), then `_meta` is atomically re-written
    * with the batch's stats ADDED — O(batch), the index is not
    * re-scanned.
    *
    * Crash/replay semantics, reasoned (the r5 split-artifact class):
    * postings land BEFORE the meta update, so a crash between the two
    * leaves new postings scored under slightly stale corpus stats —
    * every document still retrievable; the reverse order would inflate
    * N against missing postings. A REPLAYED append lays down duplicate
    * identical posting rows and adds its stats twice: the duplicate
    * ROWS are collapsed by the `.distinct()` every reader applies
    * ([[queryPostingsIndex]]/[[compactPostingsIndex]]/
    * [[repairPostingsMeta]]), and the doubled STATS are healed by
    * [[repairPostingsMeta]] — run it (or compact) after any suspected
    * replay. `idCol` values must be new to the index (an append is not
    * an upsert: re-appending a changed document's text is user error
    * and leaves both versions' postings). */
  def appendToPostingsIndex(batch: DataFrame, idCol: String,
      textCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    FsOps.healSwap(spark, path + ".building", path)
    FsOps.healSwap(spark, path + "/_meta.rebuilding", path + "/_meta")
    val toks = batch.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .persist()
    try {
      toks.select(col("doc_id"), size(col("tk")).as("dl"),
          explode(col("tk")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))
        .write.mode("append").parquet(path)
      val old = spark.read.parquet(path + "/_meta").collect().head
      val add = toks.agg(count(lit(1)), sum(size(col("tk")))).collect().head
      val metaTmp = path + "/_meta.rebuilding"
      import spark.implicits._
      // an index written from an empty (or all-null-text) corpus
      // persists total_dl = NULL (SUM over zero rows) — appending to
      // it is the legitimate first-real-batch path, so read it as 0
      Seq((old.getLong(0) + add.getLong(0),
          (if (old.isNullAt(1)) 0L else old.getLong(1)) +
            (if (add.isNullAt(1)) 0L else add.getLong(1))))
        .toDF("n_docs", "total_dl")
        .coalesce(1).write.mode("overwrite").parquet(metaTmp)
      FsOps.swapDirs(spark, metaTmp, path + "/_meta")
    } finally toks.unpersist()
  }

  /** Recompute `_meta` (n_docs, total_dl) exactly from the postings —
    * one narrow aggregate over DISTINCT index rows (dl rides on every
    * posting; max per doc is exact), swapped in atomically. Heals the
    * append crash window and a replayed append's doubled stats. Note:
    * a doc with NO tokens has no postings — after a repair such docs
    * drop out of N, a documented hair of conservatism ([[bm25]] counts
    * them; they can never match a query either way). */
  def repairPostingsMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val metaTmp = path + "/_meta.rebuilding"
    spark.read.parquet(path).distinct()
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .coalesce(1).write.mode("overwrite").parquet(metaTmp)
    FsOps.swapDirs(spark, metaTmp, path + "/_meta")
  }

  /** Rewrite a multi-segment postings index back to `numFiles`
    * term-range-sorted DISTINCT files (collapses any replayed append's
    * duplicate rows, restores fresh-build pruning) and repair the
    * stats — the standard two-phase compaction. */
  def compactPostingsIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, numFiles: Int = 32): Unit = {
    FsOps.healSwap(spark, path + ".building", path)
    val tmp = path + ".building"
    val rows = spark.read.parquet(path).distinct().persist()
    try {
      rows.repartitionByRange(numFiles, col("term"), col("doc_id"))
        .sortWithinPartitions(col("term"), col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      rows.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .coalesce(1).write.mode("overwrite").parquet(tmp + "/_meta")
    } finally rows.unpersist()
    FsOps.swapDirs(spark, tmp, path)
  }

  /** BM25 top-matching documents served from a [[writePostingsIndex]]
    * index: identical scores to [[bm25]] over the same corpus (the
    * arithmetic shapes match term for term; the per-doc sum is the same
    * DECIMAL(18,12) order-independent aggregate), but the corpus is
    * never re-read — the scan prunes to the queried terms' posting
    * files and df comes from the rows it already read, deduplicated
    * first so a replayed append cannot double-count (cheap: the
    * distinct runs over the PRUNED rows only). The `_meta` read is one
    * row (driver-bounded). */
  def queryPostingsIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    FsOps.healSwap(spark, path + ".building", path)
    // and the meta rebuild's own delete→rename window
    FsOps.healSwap(spark, path + "/_meta.rebuilding", path + "/_meta")
    val meta = spark.read.parquet(path + "/_meta").collect().head
    // an empty-corpus index persists total_dl = NULL (SUM over zero
    // rows) and n_docs = 0 — there is nothing to score and avgdl would
    // be 0/0 (constant-folded under ANSI): typed error beats an NPE
    if (meta.getLong(0) == 0L || meta.isNullAt(1))
      throw graft.NoDataError(s"$path (empty postings index)")
    val (nDocs, totalDl) = (meta.getLong(0), meta.getLong(1))
    val tf = spark.read.parquet(path)
      .filter(col("term").isin(queryTerms: _*)).distinct()
    val dfreq = broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
    val avgdl = lit(totalDl).cast("double") / lit(nDocs).cast("double")
    val ratio = (lit(nDocs).cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + ratio) else ratio
    val num = col("tf").cast("double") * (lit(k1) + lit(1.0))
    val den = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    tf.join(dfreq, "term")
      .withColumn("term_score", (idf * num / den).cast("decimal(18,12)"))
      .groupBy(col("doc_id")).agg(sum(col("term_score")).as("score_dec"))
      .select(col("doc_id"), col("score_dec").cast("double").as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of several
    * rankers' TOP-N lists — the hybrid-retrieval merge (BM25 ∪ vector
    * cosine is the canonical pair): fused score =
    * Σ_rankers `scale div (k + rank)`, all exact LONG arithmetic
    * (truncating division ≡ DuckDB `//` on these positive operands), so
    * the fusion is bit-reproducible at any parallelism and across
    * engines — no float score normalization, which is RRF's whole
    * appeal. Items on only some lists get only those terms (standard
    * RRF).
    *
    * Scale shape: inputs are top-N lists (each produced by
    * `orderBy().limit(N)` = TakeOrderedAndProject — per-partition
    * top-k, never a global sort), so the fusion aggregates ≤ Σ N rows —
    * driver-trivial regardless of corpus size.
    *
    * @param rankings each `(idCol, rank)` with rank 1-based and unique
    *                 per frame
    * @return (idCol, rrf_score long, n_rankers int) */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60,
      scale: Long = 1000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0 && scale > 0, s"rrfFuse k=$k scale=$scale out of range")
    rankings.map(_.select(col(idCol),
        call_function("div", lit(scale),
          lit(k.toLong) + col("rank").cast("long")).as("__c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf_score"),
        count(lit(1)).cast("int").as("n_rankers"))
  }
}
