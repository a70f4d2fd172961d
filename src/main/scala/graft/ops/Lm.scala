package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted corpus language model — the CCNet-style quality filter's
  * production shape: learn bigram statistics from a TRUSTED reference
  * corpus once, then score every new crawl batch against that artifact
  * ("does this document read like the reference?") without re-touching
  * the reference. [[graft.ops.TextAnalysis.bigramPlausibility]] is the
  * one-corpus self-scored variant; this is the cross-corpus persisted
  * one.
  *
  * Model artifact: ONE table of `(w1, w2, c)` rows where `w2 IS NULL`
  * marks the context total c1(w1) — all sufficient statistics in one
  * atomically-swapped table (the r5 split-artifact lesson: a
  * counts/context two-directory model has a crash window between the
  * two swaps where scores divide by mismatched stats). Size is bounded
  * by the reference's observed bigram vocabulary.
  *
  * Scoring stays in the repo's exact-arithmetic envelope: P(w2|w1) =
  * c12/c1 is rational (no transcendentals, unlike log-perplexity), and
  * each probability goes through the round-to-INTEGER stable conversion
  * `round(p·10¹²) cast long` before the per-doc sum — exact LONG
  * arithmetic, order-independent under any parallelism AND engine
  * (DECIMAL casts of arbitrary quotient doubles are NOT cross-engine
  * stable on rare boundary values — the [[Similarity.meanPool]]
  * recipe; see CLAUDE.md round-3 notes). Replayed bitwise by the t33
  * oracle. Unseen bigram or unseen context scores 0 (the harshest
  * backoff; documents full of out-of-reference language are exactly
  * the ones the filter exists to down-rank).
  */
object Lm {

  private def grams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bigram array bound once (HOF-CSE trap — see bigramPlausibility)
    val bigramsArr = Dedup.bindOnce(TextAnalysis.tokens(col(textCol))) { tk =>
      when(size(tk) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(0), size(tk) - 2),
          i => struct(element_at(tk, i + 1).as("w1"), element_at(tk, i + 2).as("w2"))))
    }
    df.select(col(idCol).as("doc_id"), explode(bigramsArr).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
  }

  /** Learn and persist the reference LM at `path`: bigram count rows
    * plus `w2 IS NULL` context-total rows, one table, two-phase swap.
    * ONE corpus tokenize/explode pass: the context totals derive from
    * the bigram-count table itself (c1(w1) = Σ_w2 c12(w1,w2) exactly),
    * so the second aggregate runs over bounded count rows, never the
    * corpus again. */
  def writeLmIndex(reference: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = reference.sparkSession
    val bc = grams(reference, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val rows = bc.unionByName(bc.groupBy(col("w1"))
        .agg(sum(col("c")).as("c")).withColumn("w2", lit(null).cast("string"))
        .select(col("w1"), col("w2"), col("c")))
      val tmp = path + ".building"
      rows.write.mode("overwrite").parquet(tmp)
      // a same-JVM rebuild may change the model's size class: the
      // memoized broadcast decision invalidates around the swap
      // (before AND after — swapDirsInvalidating's contract) so a
      // long-lived scorer re-counts instead of force-broadcasting a
      // grown model past the BroadcastModelRows rationale (an
      // availability risk, not a correctness one)
      FsOps.swapDirsInvalidating(spark, tmp, path)(() => {
        broadcastChoice.remove(path); ()
      })
    } finally bc.unpersist()
  }

  /** Score a batch against a persisted [[writeLmIndex]] model:
    * `(doc_id, n_bigrams, lm_score)` with lm_score = mean over the
    * doc's bigrams of P(w2|w1) under the REFERENCE counts (0 for
    * unseen). Docs with fewer than 2 tokens are dropped (no bigrams to
    * judge). Each model side joins BROADCAST when its row count is
    * under [[BroadcastModelRows]] — the usual case: the model is
    * bounded by the reference's observed bigram vocabulary, and a
    * CCNet-style reference is curated, not open-ended. The decision is
    * PER SIDE (an outsize bigram table must not demote the tiny
    * unigram-context side to a shuffle) and an over-ceiling side falls
    * back to a plain equi-join rather than risking the broadcast
    * memory ceiling (unlike [[Importance.scoreAgainst]], whose table
    * is bounded by a FIXED numBuckets parameter, the LM table has no
    * structural bound). The side counts cost ONE aggregate job,
    * memoized per model path for the life of the JVM — a streaming
    * screen scoring every micro-batch pays it once, not per batch
    * (staleness note: [[writeLmIndex]] invalidates the entry on a
    * same-JVM rebuild; a rewrite from ANOTHER JVM keeps the old plan
    * choice until restart — if the model GREW past the ceiling that
    * means force-broadcasting an over-ceiling side, an OOM/
    * availability risk, though never a correctness input). The
    * reference corpus is never re-read either way. */
  def scoreWithLm(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    FsOps.healSwap(spark, path + ".building", path)
    val model = spark.read.parquet(path)
    val (biSmall, ctxSmall) = broadcastChoice.computeIfAbsent(path, _ => {
      val counts = model.groupBy(col("w2").isNull.as("is_ctx")).count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      (counts.getOrElse(false, 0L) <= BroadcastModelRows,
        counts.getOrElse(true, 0L) <= BroadcastModelRows)
    })
    def side(df: DataFrame, small: Boolean) = if (small) broadcast(df) else df
    val bi = side(model.filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("c").as("c12")), biSmall)
    val ctx = side(model.filter(col("w2").isNull)
      .select(col("w1"), col("c").as("c1")), ctxSmall)
    grams(batch, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      // round-to-integer stable conversion (meanPool recipe): exact
      // long partials; p <= 1 so each partial <= 1e12. Summed as
      // DECIMAL(38,0) (the DSIR accumulator recipe): a LONG sum would
      // hit ANSI overflow at ~9.2M bigrams in one doc; the decimal sum
      // is exact to 1e38, and both engines' wide-int → DOUBLE casts
      // are correctly rounded, so the mean stays bitwise cross-engine
      .withColumn("ps", coalesce(
        round(col("c12").cast("double") / col("c1").cast("double") * lit(1e12))
          .cast("long"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ps").cast("decimal(38,0)")).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("psum").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e12))).as("lm_score"))
  }

  /** CCNet-style perplexity-bucket sampling — the canonical production
    * quality-pipeline step this tier was built toward: score every doc
    * against the persisted reference LM ([[scoreWithLm]]), cut the
    * corpus into head / middle / tail by score quantiles, and keep
    * each bucket at its own rate (head mostly kept, tail mostly
    * dropped — CCNet's "keep what reads like Wikipedia" shape, with
    * the orientation flipped to this repo's mean-probability score:
    * HIGH score = reference-like = head).
    *
    * Deterministic, engine-replayable at every step (gate p20):
    * quantile thresholds come from a [[Sketch.histSketch]] /
    * [[Sketch.histQuantiles]] pass over `round(lm_score·scoreScale)`
    * scaled longs (the stable double→integer conversion), bucket
    * labels compare scaled scores against the two integer thresholds
    * (strictly-above ⇒ upper bucket), and the per-bucket draw is
    * [[Sampling.mixtureByHash]]'s md5-threshold filter keyed on the
    * doc id — no RNG anywhere, identical under any partitioning.
    *
    * Scale shape: ONE scoring pass over the corpus (the scored frame
    * is lineage-cut — narrow (id, n_bigrams, score) rows — because it
    * feeds both the sketch and the labeling subtrees, and Catalyst
    * would otherwise re-run the bigram explode + model joins twice);
    * the histogram is bucket-rows-sized, the two thresholds ride a
    * 1-row broadcast under a cross join (the benign t08 scalar-
    * subquery shape), and the final keep is a pure per-row codegen
    * filter. Docs with fewer than 2 tokens are dropped upstream by
    * [[scoreWithLm]] (nothing to judge — CCNet buckets by LM signal,
    * which they don't have).
    *
    * @param fractions keep-rate per bucket, keys exactly
    *                  head/middle/tail
    * @param cuts      integer percentiles (lowCut, highCut) splitting
    *                  tail / middle / head, e.g. (33, 66)
    * @return (doc_id, n_bigrams, lm_score, score_scaled, bucket) for
    *         the kept rows */
  def perplexityBucketSample(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, idCol: String, textCol: String,
      fractions: Map[String, Double] =
        Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1),
      cuts: (Int, Int) = (33, 66),
      scoreScale: Long = 1000000L): DataFrame = {
    require(fractions.keySet == Set("head", "middle", "tail"),
      s"perplexityBucketSample: fractions must map exactly head/middle/" +
        s"tail, got ${fractions.keySet}")
    require(cuts._1 >= 0 && cuts._2 <= 100 && cuts._1 < cuts._2,
      s"perplexityBucketSample: cuts $cuts must be 0 <= low < high <= 100")
    require(scoreScale >= 1L && scoreScale <= (1L << 50),
      s"perplexityBucketSample: scoreScale $scoreScale out of range")
    val subBits = 5 // the tier-wide histogram geometry (t25 family)
    val scored = Lineage.cut(
      scoreWithLm(spark, path, corpus, idCol, textCol)
        .withColumn("score_scaled",
          round(col("lm_score") * lit(scoreScale.toDouble)).cast("long")))
    val sketch = Sketch.histSketch(scored.withColumn("__k", lit(0)),
      "__k", "score_scaled", subBits)
    val thresholds =
      Sketch.histQuantiles(sketch, subBits, Seq(cuts._1, cuts._2))
        .agg(
          max(when(col("pct") === cuts._1, col("est_value"))).as("__t_lo"),
          max(when(col("pct") === cuts._2, col("est_value"))).as("__t_hi"))
    val labeled = scored.crossJoin(broadcast(thresholds))
      .withColumn("bucket",
        when(col("score_scaled") > col("__t_hi"), "head")
          .when(col("score_scaled") > col("__t_lo"), "middle")
          .otherwise("tail"))
      .drop("__t_lo", "__t_hi")
    Sampling.mixtureByHash(labeled, "bucket", col("doc_id"), fractions)
  }

  /** Per-side model-row ceiling below which [[scoreWithLm]] broadcasts
    * that side. Sized for the HASHED relation, not the raw bytes: a
    * broadcast join builds UnsafeRow maps at ~3-4× the ~50 B raw row
    * (observed rule of thumb), so 2M rows ≈ 100 MB raw ≈ 300-400 MB
    * hashed on the driver and per executor — safely inside default
    * memory configs; above it the join shuffles instead. */
  val BroadcastModelRows: Long = 2000000L

  /** Per-path memoized (biSmall, ctxSmall) broadcast decisions — see
    * [[scoreWithLm]]'s staleness note. */
  private val broadcastChoice =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Boolean)]()
}
