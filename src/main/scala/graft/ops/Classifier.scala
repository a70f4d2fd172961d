package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifiers (training-data pipeline tier):
  * hashed bag-of-words features + two exact-integer trainers.
  *
  * The classic "quality filter" in LLM data pipelines is a cheap linear
  * model over hashed token features (fastText-style) scoring every
  * document. Both trainers here use EXACT integer arithmetic — no float
  * learning rate, no transcendental link — so training is reproducible
  * bit-for-bit at any parallelism AND replayable in the DuckDB oracle
  * (gate t19):
  *
  *   - [[trainCentroid]] (Rocchio): w = K·mean(x|+) − K·mean(x|−) in
  *     fixed-point units of 1/K, threshold = midpoint of the class-mean
  *     margins. ONE pass over the corpus (two aggregations), no
  *     iteration, no oscillation — the robust default. 91% accuracy on
  *     the balanced lexical-diversity task the gate trains (48% base).
  *   - [[trainPerceptron]] (batch perceptron with Gallant's pocket):
  *     synchronized whole-batch updates w' = w + Σ_mis y·x, keeping the
  *     iterate with fewest training errors. Provably convergent on
  *     separable data (spec'd); on thin-margin data the pocket guards
  *     against the batch variant's characteristic ping-pong. (Batch
  *     subgradient descent on perceptron loss is learning-rate
  *     INVARIANT from w=0 — scaling w scales every margin positively —
  *     so there is no lr knob to tune away the oscillation; the pocket
  *     is the classic remedy.)
  *
  * Scale shape: features are one explode + one (doc,bucket) hash
  * aggregation; each training pass is one broadcast join against the
  * ≤D-row weight table, one doc-keyed aggregation, and one bucket-keyed
  * aggregation (map-side combined). The model (D buckets) lives on the
  * driver like k-means centroids — bounded by construction. 100 TB
  * corpus ⇒ per-pass cost is two shuffles of narrow integer rows; cache
  * the feature frame across passes.
  */
object Classifier {

  /** Fixed-point scale for centroid weights (1/K units). */
  val Scale: Long = 65536L

  /** Portable token→bucket hash: the first 6 hex digits of md5, mod D —
    * integer-exact in Spark (`conv(hex,16,10)`) and reproducible in
    * DuckDB (digit-fold list comprehension), unlike xxhash64/murmur
    * which the oracle engine cannot replay. */
  def tokenBucket(token: Column, numBuckets: Int): Column =
    conv(substring(md5(token), 1, 6), 16, 10).cast("long") % numBuckets

  /** Hashed bag-of-words ("hashing trick"): (doc_id, bucket, cnt) sparse
    * integer count features. One explode + one hash aggregation.
    *
    * `bigrams = true` additionally hashes adjacent word PAIRS
    * (`"a b"`) into the SAME bucket space — fastText's word-n-gram
    * recipe. Word order becomes a feature: two docs with identical
    * vocabularies but different orderings share every unigram bucket
    * yet differ on bigrams (spec plants exactly that label). Costs one
    * extra zip_with per row and roughly doubles feature rows; size
    * `numBuckets` up with it (collisions grow with the gram count). */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 256, bigrams: Boolean = false): DataFrame = {
    // bindOnce: the token array feeds several sub-expressions — bound
    // as a lambda var so the split runs once per row (the HOF-blocks-CSE
    // trap, see CLAUDE.md)
    val grams = Dedup.bindOnce(TextAnalysis.tokens(col(textCol))) { toks =>
      if (!bigrams) toks
      else concat(toks,
        when(size(toks) >= 2,
          zip_with(slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>")))
    }
    df.select(col(idCol).as("doc_id"), explode(grams).as("tok"))
      .select(col("doc_id"), tokenBucket(col("tok"), numBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** A trained linear model: bucket → integer weight, decision
    * threshold (predict +1 iff margin > theta). */
  final case class LinearModel(weights: Map[Long, Long], theta: Long)

  private def weightsDf(spark: SparkSession, w: Map[Long, Long]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("bucket", LongType), StructField("w", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(w.toSeq.map { case (b, v) => Row(b, v) }, 1),
      schema)
  }

  /** Per-doc integer margins under a weight vector: Σ w[bucket]·cnt
    * (docs with no overlapping feature are absent — callers left-join
    * and coalesce to 0). */
  private def margins(features: DataFrame, w: Map[Long, Long]): DataFrame =
    features.join(broadcast(weightsDf(features.sparkSession, w)), Seq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("cnt") * col("w")).as("margin"))

  /** Truncating (toward-zero) division — Long `/` semantics, spelled
    * out so the DuckDB oracle (floor-division `//` on the magnitude,
    * sign re-applied) states the identical rule. */
  private def truncDiv(a: Long, b: Long): Long = a / b

  /** Per-bucket class sums — the ADDITIVE sufficient statistics of the
    * centroid model: (bucket, sp, sn) with sp/sn ≥ 0. One shuffle, ≤D
    * result rows. Two corpora's sums add bucket-wise, which is what
    * makes the persisted model appendable without retraining. */
  def classSums(features: DataFrame, labels: DataFrame): DataFrame =
    features.join(labels, Seq("doc_id"))
      .groupBy(col("bucket")).agg(
        sum(when(col("y") === 1, col("cnt")).otherwise(0L)).as("sp"),
        sum(when(col("y") === -1, col("cnt")).otherwise(0L)).as("sn"))

  /** Class sizes (np, nn) — the scalar half of the sufficient stats.
    * Coalesced so an empty label frame reads (0, 0), not a NULL unbox. */
  def classCounts(labels: DataFrame): (Long, Long) = {
    val counts = labels.agg(
      coalesce(sum(when(col("y") === 1, 1L).otherwise(0L)), lit(0L)).as("np"),
      coalesce(sum(when(col("y") === -1, 1L).otherwise(0L)), lit(0L)).as("nn")).head()
    (counts.getLong(0), counts.getLong(1))
  }

  /** Model from collected sufficient statistics. The threshold needs no
    * second corpus pass: margins are LINEAR, so the class-sum of margins
    * is Σ_b w[b]·sp[b] (resp. sn) — derivable from the same sums. */
  private def derive(sums: Seq[(Long, Long, Long)], np: Long, nn: Long): LinearModel = {
    require(np > 0 && nn > 0, "centroid training needs both classes present")
    val w = sums.map { case (b, sp, sn) => b -> (Scale * sp / np - Scale * sn / nn) }
      .filter(_._2 != 0L).toMap
    val smp = sums.iterator.map { case (b, sp, _) => w.getOrElse(b, 0L) * sp }.sum
    val smn = sums.iterator.map { case (b, _, sn) => w.getOrElse(b, 0L) * sn }.sum
    // midpoint of the class-mean margins (possibly negative → sign-aware
    // truncating division, mirrored in the oracle)
    LinearModel(w, truncDiv(truncDiv(smp, np) + truncDiv(smn, nn), 2L))
  }

  private def collectSums(sums: DataFrame): Seq[(Long, Long, Long)] =
    sums.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  /** Rocchio / nearest-centroid trainer in fixed point — ONE corpus
    * pass (the sufficient-statistics aggregation; the threshold derives
    * from the same sums).
    *
    * @param features (doc_id, bucket, cnt) from [[hashedFeatures]]
    * @param labels   (doc_id, y) with y ∈ {+1, -1}, one row per doc
    */
  def trainCentroid(features: DataFrame, labels: DataFrame): LinearModel = {
    val (np, nn) = classCounts(labels)
    derive(collectSums(classSums(features, labels)), np, nn)
  }

  // ------------------------------------------------- persisted model
  // The centroid model's sufficient statistics are tiny (≤D sum rows)
  // and ADDITIVE — so the persisted form supports exact append: merging
  // a new batch's sums yields bit-for-bit the model a full retrain over
  // the union would produce (spec-pinned). The class counts (np, nn)
  // live IN the sums table as a sentinel bucket −1 row (real buckets
  // are ≥ 0) — counts are additive stats like any other, and a single
  // table means a single [[FsOps.swapDirs]] per append: the whole model
  // commits atomically (a sums/meta split would leave a crash window
  // BETWEEN two swaps where weights divide by stale class counts).
  //
  // Lifecycle: a single-class model may be persisted (append the other
  // class later); DERIVING a servable model requires both classes —
  // readCentroidModel throws the informative require until then.

  private val CountsBucket = -1L

  private def statsFor(features: DataFrame, labels: DataFrame): DataFrame = {
    import features.sparkSession.implicits._
    val (np, nn) = classCounts(labels)
    classSums(features, labels).unionByName(
      Seq((CountsBucket, np, nn)).toDF("bucket", "sp", "sn"))
  }

  /** Persist the model's sufficient statistics for `features`/`labels`. */
  def writeCentroidModel(features: DataFrame, labels: DataFrame, path: String): Unit = {
    require(!labels.isEmpty, "refusing to persist an empty model")
    statsFor(features, labels).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sums")
  }

  /** Fold a new labeled batch into a persisted model: bucket-wise
    * addition (the sentinel counts row adds like every other). One
    * write-sibling-then-swap — the model commits atomically; readers
    * self-heal the swap's delete→rename window. */
  def appendCentroidModel(spark: SparkSession, path: String,
      features: DataFrame, labels: DataFrame): Unit = {
    FsOps.healSwap(spark, s"$path/sums.appending", s"$path/sums")
    val merged = spark.read.parquet(s"$path/sums")
      .unionByName(statsFor(features, labels))
      .groupBy(col("bucket")).agg(sum(col("sp")).as("sp"), sum(col("sn")).as("sn"))
      .localCheckpoint() // materialize BEFORE overwriting the source
    merged.coalesce(1).write.mode("overwrite").parquet(s"$path/sums.appending")
    FsOps.swapDirs(spark, s"$path/sums.appending", s"$path/sums")
  }

  /** Derive the servable model from persisted sufficient statistics. */
  def readCentroidModel(spark: SparkSession, path: String): LinearModel = {
    FsOps.healSwap(spark, s"$path/sums.appending", s"$path/sums")
    val all = collectSums(spark.read.parquet(s"$path/sums"))
    val (counts, sums) = all.partition(_._1 == CountsBucket)
    require(counts.nonEmpty, s"corrupt centroid model at $path: no counts row")
    derive(sums, counts.head._2, counts.head._3)
  }

  /** Train a batch perceptron (theta fixed at 0 — include a constant
    * bias feature in `features` if an intercept is wanted).
    *
    * @param features (doc_id, bucket, cnt) — cache it: every iteration
    *                 scans it twice (three times with pocket)
    * @param labels   (doc_id, y) with y ∈ {+1, -1}
    * @param pocket   keep the iterate with fewest training errors
    *                 (earliest wins ties) instead of the last one
    */
  def trainPerceptron(features: DataFrame, labels: DataFrame,
      iterations: Int = 3, pocket: Boolean = false): LinearModel = {
    require(iterations >= 1, "iterations must be >= 1")
    var w = Map.empty[Long, Long]
    var best = w
    var bestErr = Long.MaxValue
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      // iteration 1: empty weights ⇒ all margins 0 ⇒ every doc
      // misclassified (y·0 ≤ 0) — the standard cold start
      val m = margins(features, w)
      val mis = labels.join(m, Seq("doc_id"), "left")
        .filter(col("y") * coalesce(col("margin"), lit(0L)) <= 0)
        .select(col("doc_id"), col("y"))
      val grad = features.join(mis, Seq("doc_id"))
        .groupBy(col("bucket")).agg(sum(col("y") * col("cnt")).as("g"))
        .collect() // ≤ numBuckets rows — model-sized, like k-means centroids
      if (pocket) {
        // |mis| = docs touching any bucket … not derivable from grad
        // (feature-less docs); count it directly
        val errs = mis.count()
        if (errs < bestErr) { bestErr = errs; best = w }
        if (errs == 0) converged = true
      } else if (grad.isEmpty) converged = true
      if (!converged) {
        val g = grad.map(r => r.getLong(0) -> r.getLong(1)).toMap
        w = (w.keySet ++ g.keySet).iterator
          .map(b => b -> (w.getOrElse(b, 0L) + g.getOrElse(b, 0L)))
          .filter(_._2 != 0L).toMap
      }
      i += 1
    }
    if (pocket && !converged) {
      // the last iterate was updated but never error-scored — score it
      val finalErr = labels.join(margins(features, w), Seq("doc_id"), "left")
        .filter(col("y") * coalesce(col("margin"), lit(0L)) <= 0).count()
      if (finalErr < bestErr) best = w
    }
    LinearModel(if (pocket && !converged) best else w, 0L)
  }

  /** Score docs with a trained model: (doc_id, margin, pred) with
    * pred = +1 iff margin > theta (ties negative — matches training's
    * "≤ is misclassified" convention). `universe` supplies the full doc
    * set so feature-less docs score margin 0. */
  def score(features: DataFrame, universe: DataFrame, model: LinearModel): DataFrame =
    universe.select(col("doc_id"))
      .join(margins(features, model.weights), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("margin"), lit(0L)).as("margin"),
        when(coalesce(col("margin"), lit(0L)) > model.theta, 1).otherwise(-1).as("pred"))

  /** Row-local margin — the SERVING path: Σ_tokens w[bucket(token)],
    * computed inside one projection from a broadcast weight-map
    * literal. No feature shuffle, no state, so it scores unbounded
    * STREAMS (plain append-mode projection) and costs one map lookup
    * per token at 100 TB. Bitwise equal to [[score]]'s margins:
    * weights are linear in counts, so the per-token sum IS the
    * per-bucket dot product (spec-pinned).
    *
    * @param numBuckets must match the [[hashedFeatures]] dimension the
    *        model was trained with */
  def localMargin(text: Column, model: LinearModel, numBuckets: Int = 256): Column = {
    val wmap = typedLit(model.weights)
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => coalesce(element_at(wmap, tokenBucket(t, numBuckets)), lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Row-local prediction: +1 iff [[localMargin]] > theta. */
  def localPred(text: Column, model: LinearModel, numBuckets: Int = 256): Column =
    when(localMargin(text, model, numBuckets) > model.theta, 1).otherwise(-1)
}
