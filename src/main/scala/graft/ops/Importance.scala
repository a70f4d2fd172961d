package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance weighting (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169 — the published construction): fit hashed
  * bag-of-n-grams generative models of a small TARGET corpus (the data
  * you want more of) and the big RAW pool, then score every raw document
  * by how target-like its n-gram distribution is. The standard
  * domain-matching selector in LLM pretraining pipelines — "give me the
  * CommonCrawl slice that looks like Wikipedia".
  *
  * Deterministic variant (default): per-bucket weights are
  * integer-scaled LIKELIHOOD RATIOS
  * `w_b = round(scale · p̂_t(b) / p̂_r(b))` with add-one smoothing
  * (`p̂(b) = (c_b + 1)/(N + B)`), and each document scores
  * `Σ_b c_db · w_b` in EXACT long arithmetic — bit-reproducible at any
  * parallelism and replayable by the DuckDB oracle (gates t36/e20): the
  * ratio is one double division of two exactly-computed longs, the
  * `round(x·scale)` step is the cross-engine-stable double→integer
  * conversion (see CLAUDE.md round-3 notes). `logWeights = true` gives
  * the paper's exact form (`w_b = round(scale · ln(p̂_t/p̂_r))`, doc
  * score = scaled log likelihood ratio) — same plan shape but `ln` is
  * transcendental, so it is reproducible within Spark yet not
  * oracle-gated cross-engine (the t08 `logIdf` precedent).
  *
  * Persisted model ([[writeImportanceModel]]): the sufficient statistics
  * — per-bucket (ct, cr) sums plus sentinel rows for totals and config —
  * live in ONE table behind one atomic swap (the r5 two-swap-crash-window
  * lesson), so the model is appendable bucket-wise without retraining
  * ([[appendImportanceModel]]) and servable against any later batch
  * ([[scoreWithModel]] — the streaming screen's path, gate e20).
  *
  * Shape at 100 TB: two feature builds (explode + hash agg each,
  * materialized once via [[Lineage.cut]]), two ≤B-row bucket
  * aggregations, two 1-row total reads (driver-bounded by construction),
  * one broadcast-sized (≤B rows) weight join against the scored
  * features, one doc-keyed aggregation — no windows over data, no
  * cartesian anything. The weight table and the persisted artifact are
  * bounded by `numBuckets` regardless of corpus size.
  */
object Importance {

  /** Sentinel bucket carrying (Nt, Nr) totals in a persisted model. */
  private val MetaBucket = -1L

  /** Sentinel bucket carrying (numBuckets, bigrams 0/1) config. */
  private val ConfBucket = -2L

  /** The shared weight column over (ct, cr) sums — ONE expression
    * shape, so the inline scorer, the persisted-model scorer and the
    * DuckDB oracles all replay it bitwise. */
  private def weightCol(nt: Long, nr: Long, b: Long, scale: Long,
      logWeights: Boolean): Column = {
    val num = (coalesce(col("ct"), lit(0L)) + 1L) * lit(nr + b)
    val den = (coalesce(col("cr"), lit(0L)) + 1L) * lit(nt + b)
    val ratio = num.cast("double") / den.cast("double")
    // the weight itself can pass 2⁶³ inside the smoothing bound
    // (ratio ≤ (Nt+1)(Nr+B)/(Nt+B) on asymmetric corpora) — typed raise
    // instead of an ANSI cast error at an arbitrary weight row. The
    // upper test is ≥ 2⁶³ (Long.MaxValue.toDouble): any castable double
    // is strictly below it; −2⁶³ itself is a valid long
    val wd = round((if (logWeights) log(ratio) else ratio) * lit(scale.toDouble))
    when(wd >= lit(Long.MaxValue.toDouble) || wd < lit(Long.MinValue.toDouble),
      raise_error(concat(lit("Importance: bucket weight overflows long "),
        lit("at bucket "), col("bucket").cast("string"), lit(" — shrink scale"))))
      .otherwise(wd.cast("long"))
  }

  private def requireSmoothingBound(nt: Long, nr: Long, b: Long): Unit =
    require(nr + b > 0L && nt + b <= Long.MaxValue / (nr + b),
      s"Importance: (Nt+B)·(Nr+B) overflows long (Nt=$nt Nr=$nr B=$b) — " +
        "downsample the feature counts")

  /** Score a feature frame against a bucket-weight table and re-attach
    * every id (no-gram docs score 0). `weights` must cover every bucket
    * `features` can contain. */
  private def scoreAgainst(weights: DataFrame, features: DataFrame,
      ids: DataFrame): DataFrame = {
    // score accumulates in DECIMAL(38,0): cnt·w can pass 2⁶³ on skewed
    // ratio × long-doc combinations inside the smoothing bound, and an
    // ANSI long sum would raise at an arbitrary row — the decimal sum
    // is exact, and the one typed raise below names the doc instead
    val dscore = sum(col("cnt").cast("decimal(19,0)") *
      col("w").cast("decimal(19,0)"))
    val scores = features.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_grams"),
        when(dscore > lit(Long.MaxValue) || dscore < lit(Long.MinValue),
          raise_error(concat(lit("Importance: score overflows long for doc "),
            col("doc_id").cast("string"), lit(" — shrink scale"))))
          .otherwise(dscore.cast("long")).as("score"))
    ids.join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Importance scores for every `raw` document against a `target`
    * corpus — higher = more target-like. See the object doc for the
    * weighting scheme.
    *
    * Overflow bound (guarded with a typed raise): smoothing products
    * `(c_b+1)·(N+B)` are bounded by `(Nt+B)·(Nr+B)`, which must stay
    * under 2⁶³ — both corpora under ~3·10⁹ total grams. Beyond that,
    * downsample the feature counts or shrink `scale`.
    *
    * @param raw     pool to score, one row per document
    * @param target  corpus whose distribution defines "good" (may
    *                overlap `raw`; must be non-empty after tokenizing)
    * @param numBuckets hash-feature space (collisions blur weights —
    *                size like a classifier feature space)
    * @param bigrams also hash adjacent word pairs (fastText recipe,
    *                the paper's default feature set)
    * @param scale   fixed-point scale for bucket weights
    * @param logWeights use the paper's log-ratio weights (NOT
    *                cross-engine reproducible; see object doc)
    * @return (doc_id, n_grams, score) for EVERY raw row — docs with no
    *         grams score 0 */
  def ngramImportance(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = 256, bigrams: Boolean = false,
      scale: Long = 1000000L, logWeights: Boolean = false): DataFrame = {
    require(numBuckets >= 2, s"ngramImportance: numBuckets=$numBuckets must be >= 2")
    require(scale >= 1L, s"ngramImportance: scale=$scale must be >= 1")
    val (fr, joined) = corpusSums(raw, target, idCol, textCol, numBuckets, bigrams)
    // eager 1-row total read (driver-bounded): the totals embed as
    // literals in the weight expression, so the weight join needs no
    // scalar-subquery broadcast shapes
    val tot = joined.agg(coalesce(sum(col("ct")), lit(0L)),
      coalesce(sum(col("cr")), lit(0L))).head()
    val (nt, nr) = (tot.getLong(0), tot.getLong(1))
    require(nt > 0L, "ngramImportance: target corpus has no grams")
    val b = numBuckets.toLong
    requireSmoothingBound(nt, nr, b)
    val weights = joined
      .select(col("bucket"), weightCol(nt, nr, b, scale, logWeights).as("w"))
    scoreAgainst(weights, fr, raw.select(col(idCol).as("doc_id")))
  }

  /** The shared corpus-sums build: raw features (materialized once via
    * [[Lineage.cut]] — they otherwise appear several times across the
    * total read and the scoring plan) and the full-outer per-bucket
    * `(bucket, ct, cr)` frame over both vocabularies (nullable counts —
    * [[weightCol]] smooths nulls as zero). ONE definition, so the
    * inline scorer and the persisted model cannot drift. */
  private def corpusSums(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int,
      bigrams: Boolean): (DataFrame, DataFrame) = {
    val fr = Lineage.cut(
      Classifier.hashedFeatures(raw, idCol, textCol, numBuckets, bigrams))
    val ft = Lineage.cut(
      Classifier.hashedFeatures(target, idCol, textCol, numBuckets, bigrams))
    val rawSums = fr.groupBy(col("bucket")).agg(sum(col("cnt")).as("cr"))
    val tgtSums = ft.groupBy(col("bucket")).agg(sum(col("cnt")).as("ct"))
    (fr, tgtSums.join(rawSums, Seq("bucket"), "full_outer"))
  }

  /** The model's sufficient statistics: per-bucket (ct, cr) over the
    * bucket union, plus the `MetaBucket` totals row. ≤ B+1 rows. */
  private def bucketStats(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int, bigrams: Boolean): DataFrame = {
    // cut: the ≤B-row frame feeds both the union branch and the totals
    // aggregate — without it the two corpus aggregations and the join
    // run twice (the r2 union-branch + agg-subtree plan-doubling trap)
    val buckets = Lineage.cut(
      corpusSums(raw, target, idCol, textCol, numBuckets, bigrams)._2
        .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"),
          coalesce(col("cr"), lit(0L)).as("cr")))
    buckets.unionByName(buckets.agg(lit(MetaBucket).as("bucket"),
      coalesce(sum(col("ct")), lit(0L)).as("ct"),
      coalesce(sum(col("cr")), lit(0L)).as("cr")))
  }

  /** Persist the model's sufficient statistics — appendable, servable.
    * ONE table (bucket sums + sentinel totals + sentinel config), staged
    * to a sibling and atomically swapped in: a crash mid-write leaves an
    * existing model untouched, and the delete→rename window self-heals
    * at every read/append ([[FsOps.healSwap]]). The config sentinel pins
    * `numBuckets`/`bigrams` so append and serve cannot silently hash
    * into a different feature space. */
  def writeImportanceModel(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, path: String, numBuckets: Int = 256,
      bigrams: Boolean = false): Unit = {
    require(numBuckets >= 2, s"writeImportanceModel: numBuckets=$numBuckets must be >= 2")
    val spark = raw.sparkSession
    // complete any interrupted swap first so the stale staging dir of a
    // crashed append can never be resurrected over this fresh write
    FsOps.healSwap(spark, s"$path/sums.staging", s"$path/sums")
    val stats = bucketStats(raw, target, idCol, textCol, numBuckets, bigrams)
    val conf = spark.range(1).select(
      lit(ConfBucket).as("bucket"), lit(numBuckets.toLong).as("ct"),
      lit(if (bigrams) 1L else 0L).as("cr"))
    stats.unionByName(conf).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sums.staging")
    FsOps.swapDirs(spark, s"$path/sums.staging", s"$path/sums")
  }

  /** Fold new corpora into a persisted model: bucket-wise addition (the
    * totals sentinel adds like every other bucket; the config sentinel
    * appears only on the persisted side, so the sum leaves it intact).
    * Either side may be empty (e.g. append raw-pool docs only). One
    * write-sibling-then-swap — the model commits atomically; readers
    * self-heal the swap's delete→rename window. The merge plan stays
    * LAZY: it reads the intact `sums` dir while writing the staging
    * sibling (no self-overwrite), so a lost executor just recomputes —
    * a checkpoint here would only add non-recomputable blocks. */
  def appendImportanceModel(spark: SparkSession, path: String,
      raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String): Unit = {
    FsOps.healSwap(spark, s"$path/sums.staging", s"$path/sums")
    val existing = spark.read.parquet(s"$path/sums")
    val (numBuckets, bigrams) = readConf(existing, path)
    val merged = existing
      .unionByName(bucketStats(raw, target, idCol, textCol, numBuckets, bigrams))
      .groupBy(col("bucket"))
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))
    merged.coalesce(1).write.mode("overwrite").parquet(s"$path/sums.staging")
    FsOps.swapDirs(spark, s"$path/sums.staging", s"$path/sums")
  }

  private def readConf(sums: DataFrame, path: String): (Int, Boolean) = {
    val conf = sums.filter(col("bucket") === ConfBucket).collect()
    require(conf.nonEmpty, s"corrupt importance model at $path: no config row")
    (conf.head.getLong(1).toInt, conf.head.getLong(2) == 1L)
  }

  /** Score a batch against a persisted model — the streaming screen's
    * path (gate e20): weights derive from the stored sums with the SAME
    * expression as [[ngramImportance]], over the FULL bucket range
    * (`range(0, numBuckets)` left-joined to the stored rows), so grams
    * hashing into buckets the seed corpora never saw still get their
    * smoothed weight instead of silently dropping. Reads the ≤B-row
    * artifact; the batch is tokenized once. */
  def scoreWithModel(spark: SparkSession, path: String, df: DataFrame,
      idCol: String, textCol: String, scale: Long = 1000000L,
      logWeights: Boolean = false): DataFrame = {
    require(scale >= 1L, s"scoreWithModel: scale=$scale must be >= 1")
    FsOps.healSwap(spark, s"$path/sums.staging", s"$path/sums")
    // cut: the ≤B-row artifact is read three times (config, totals,
    // weight join) — materialize once, honoring the checkpoint flag
    val sums = Lineage.cut(spark.read.parquet(s"$path/sums"))
    val (numBuckets, bigrams) = readConf(sums, path)
    val meta = sums.filter(col("bucket") === MetaBucket).collect()
    require(meta.nonEmpty, s"corrupt importance model at $path: no totals row")
    val (nt, nr) = (meta.head.getLong(1), meta.head.getLong(2))
    require(nt > 0L, s"importance model at $path has an empty target corpus")
    val b = numBuckets.toLong
    requireSmoothingBound(nt, nr, b)
    val weights = spark.range(numBuckets).select(col("id").as("bucket"))
      .join(sums.filter(col("bucket") >= 0L), Seq("bucket"), "left")
      .select(col("bucket"), weightCol(nt, nr, b, scale, logWeights).as("w"))
    val features =
      Classifier.hashedFeatures(df, idCol, textCol, numBuckets, bigrams)
    scoreAgainst(weights, features, df.select(col(idCol).as("doc_id")))
  }
}
