package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both operators key on a HASH of row identity instead of an RNG:
  * the sample is identical under any partitioning, executor count, or
  * re-run — the property a 100 TB pipeline needs for resumability (a
  * retried stage must draw the same rows), for train/eval splits that
  * never leak across reruns, and for audit (an independent engine can
  * recompute the exact sample — the gate's DuckDB oracle does).
  * md5 rather than xxhash64 is the cross-engine-portable choice; both
  * are codegen'd per-row kernels with no shuffle on the Bernoulli path.
  */
object Sampling {

  /** First 12 hex digits (48 bits) of `fraction` of the md5 space —
    * public so an external verifier can recompute the exact predicate. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    f"${math.min((fraction * 0x1000000000000L.toDouble).toLong, 0xFFFFFFFFFFFFL)}%012x"
  }

  /** Deterministic Bernoulli sample: keep rows whose md5(key) hex digest
    * sorts below the fraction threshold (string compare on the first 12
    * lower-hex digits — 48 bits of precision). Pure per-row filter:
    * pushes down, no shuffle, no RNG state. fraction 1.0 is the identity
    * (the strict `<` against the max threshold would otherwise drop each
    * row with probability 2⁻⁴⁸ — real rows at 10¹² scale). */
  def bernoulliByHash(df: DataFrame, key: Column, fraction: Double): DataFrame =
    if (fraction >= 1.0) df else df.filter(keepPredicate(key, fraction))

  /** Deterministic stratified sample: the `n` rows of each stratum with
    * the smallest md5(key) (key tie-break). Two-stage top-n — a partial
    * rank inside each input partition caps what the final per-stratum
    * rank sees at n × numPartitions — so one giant stratum (e.g. "en" at
    * 90% of a 100 TB corpus) never funnels into a single sort task; same
    * guard as [[Similarity.topKPerQuery]]. */
  def stratifiedByHash(df: DataFrame, stratumCol: String, key: Column, n: Int): DataFrame = {
    val h = md5(key.cast("string"))
    val partial = Window.partitionBy(col(stratumCol), spark_partition_id()).orderBy(h, key)
    val fin = Window.partitionBy(col(stratumCol)).orderBy(h, key)
    df.withColumn("__pr", row_number().over(partial)).filter(col("__pr") <= n).drop("__pr")
      .withColumn("__rn", row_number().over(fin)).filter(col("__rn") <= n).drop("__rn")
  }

  /** Threshold string for a per-domain mixture entry: fractions ≥ 1.0
    * map to `"g"`, which sorts after every lower-hex digest — making the
    * keep-everything case exact under the strict `<` compare (the same
    * 2⁻⁴⁸ row-loss guard as [[bernoulliByHash]]'s identity short-cut,
    * expressed as data so it survives inside a CASE arm). */
  def hexThresholdLex(fraction: Double): String =
    if (fraction >= 1.0) "g" else hexThreshold(fraction)

  /** Deterministic domain-mixture sample: keep each row with the
    * fraction configured for its domain (e.g. per-source or per-language
    * up/down-weighting when assembling a training mix). Same
    * md5-threshold predicate as [[bernoulliByHash]], with the threshold
    * chosen per row by a CASE over the domain column — still a pure
    * per-row codegen filter: no shuffle, no join, pushes down to the
    * scan, identical under any partitioning. Domains absent from
    * `fractions` fall back to `defaultFraction`. */
  def mixtureByHash(df: DataFrame, domainCol: String, key: Column,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f not in [0,1]"))
    // deterministic CASE-arm order so plans (and EXPLAIN output) are stable
    val thr = fractions.toSeq.sortBy(_._1).foldRight(
        lit(hexThresholdLex(defaultFraction)): Column) { case ((d, f), acc) =>
      when(col(domainCol) === d, lit(hexThresholdLex(f))).otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 12) < thr)
  }

  /** Deterministic global shuffle for training-data writes: orders rows
    * by md5(seed || ":" || key) and assigns a contiguous 1-based global
    * position. The order is a pure function of (seed, key) —
    * partitioning-invariant, reproducible across reruns, and
    * recomputable by an independent engine (the gate's DuckDB oracle
    * does) — the property that lets a resumed or re-sharded 100 TB
    * training-data write produce the identical example order, and lets
    * epoch N+1 use a fresh order by changing only `seed`.
    *
    * Scale shape: a range-partitioned sort on the hash (Spark samples
    * range bounds, so the sort is n-way parallel — `row_number()` over
    * an unpartitioned window would funnel the whole corpus into ONE
    * task), then contiguous positions from per-partition offsets via
    * `zipWithIndex` (one tiny per-partition count job + a map — no
    * second shuffle, no driver materialization). Rows with equal keys
    * share a hash; their relative order is tie-broken by the key string,
    * so the output position set is stable for unique keys and
    * multiset-stable otherwise. */
  def shuffleByHash(df: DataFrame, key: Column, seed: String = "",
      posCol: String = "shuffle_pos"): DataFrame = {
    val spark = df.sparkSession
    val keyStr = key.cast("string")
    val sorted = df
      .withColumn("__sh", md5(concat(lit(seed), lit(":"), keyStr)))
      .withColumn("__sk", keyStr)
      .repartitionByRange(col("__sh"), col("__sk"))
      .sortWithinPartitions(col("__sh"), col("__sk"))
      .drop("__sh", "__sk")
    val withPos = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withPos,
      sorted.schema.add(posCol, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Lehmer/MINSTD parameters for [[lehmerState]] — public so an
    * external verifier (the gate's DuckDB oracle) can recompute the
    * exact pseudo-uniform stream. */
  val LehmerM: Long = 2147483647L // 2^31 − 1, prime
  val LehmerA: Long = 48271L      // MINSTD multiplier

  /** Deterministic pseudo-uniform state in [1, M−1] from an integer
    * key: two Lehmer steps `v ← A·v mod M` seeded with
    * `pmod(key + seed, M−1) + 1` (never 0, so the prime-modulus
    * recurrence never collapses). All intermediates fit in a BIGINT
    * (A·v < 2^47) and use only `*`/`%` — bitwise reproducible by any
    * engine with 64-bit integers, unlike xxhash64 (Spark-only constant
    * folding) or md5 hex (string-typed). */
  def lehmerState(key: Column, seed: Long = 0L): Column = {
    val v0 = pmod(key.cast("long") + lit(seed), lit(LehmerM - 1)) + lit(1L)
    val v1 = (lit(LehmerA) * v0) % lit(LehmerM)
    (lit(LehmerA) * v1) % lit(LehmerM)
  }

  /** Deterministic weighted sample without replacement: priority
    * sampling (Duffield, Lund & Thorup) — each row draws priority
    * `w / u` with `u` pseudo-uniform in (0,1), and the `n` highest
    * priorities win, so inclusion probability grows with weight (the
    * "sample big domains/docs proportionally more" primitive for
    * mixture building and weighted eval sets). `u = v / M` with
    * `v =` [[lehmerState]]`(key, seed)`, so the whole draw is a pure
    * function of (key, seed): partitioning-invariant, resumable, and
    * recomputable by an independent engine. The priority is ONE double
    * division of exact BIGINTs (`w·M / v`) — bitwise cross-engine
    * stable; ties (only possible via equal `w·M / v`) break by key.
    *
    * Scale shape: per-row codegen draw + `orderBy(...).limit(n)`,
    * which Spark plans as TakeOrderedAndProject — a per-partition
    * top-n then a driver-side merge of n-row heaps; the corpus is
    * never globally sorted. Rows with weight ≤ 0 or NULL are excluded
    * (they can never be sampled). `weight` must be integer-typed: the
    * `w·M` scaling that keeps the division exact requires an exact
    * integer weight (token counts, byte sizes, click counts — the
    * usual weights — all are). */
  def prioritySample(df: DataFrame, key: Column, weight: Column, n: Int,
      seed: Long = 0L, priorityCol: String = "priority"): DataFrame = {
    require(n > 0, "n must be positive")
    // the integer-weight contract is enforced on the TYPE, loudly: a
    // fractional weight would silently truncate on the long cast (0.4 →
    // excluded at priority 0, 1.9 → sampled at half its intended
    // probability) — both are wrong answers, not edge cases
    val wType = df.select(weight.as("__w")).schema.head.dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(wType),
      s"prioritySample: weight must be integer-typed (token counts, byte " +
        s"sizes...), got $wType — round or scale to integers explicitly first")
    df.filter(weight.cast("long") > 0)
      .withColumn(priorityCol,
        (weight.cast("long") * lit(LehmerM)).cast("double") /
          lehmerState(key, seed))
      .orderBy(col(priorityCol).desc, key)
      .limit(n)
  }

  /** Deterministic weighted train/val/test split: label each row by
    * which cumulative-weight interval of the md5(key) space it falls in.
    * Pure per-row codegen — no shuffle, no RNG, partitioning-invariant —
    * and the same key always lands in the same split across reruns and
    * engines (the audit/resumability property a 100 TB pipeline needs).
    *
    * Leakage-safe variant for free: pass a GROUP key (exact-dedup
    * canonical id, near-dup cluster representative, source domain) as
    * `key` and every member of the group lands in the same split — the
    * standard guard against train/test contamination via duplicates. */
  def splitByHash(df: DataFrame, key: Column, splits: Seq[(String, Double)],
      labelCol: String = "split"): DataFrame =
    df.withColumn(labelCol, splitLabel(key, splits))

  /** Leakage-free train/eval split — [[splitByHash]] composed with the
    * decontamination step every production pipeline runs between
    * splitting and training (the GPT-3/Gopher appendix recipe, here at
    * EXACT n-gram granularity — t35's Bloom screen is the probabilistic
    * scale path): any non-eval document sharing at least one distinct
    * word n-gram with any document of the `evalSplit` arm is relabeled
    * `quarantineLabel` instead of entering training, and every row
    * reports its shared-gram count. Eval rows keep their label with
    * count 0 (sharing with themselves is not leakage). Documents
    * shorter than n tokens carry their whole text as one pseudo-gram
    * ([[Dedup.wordShingles]]' contract), so even short eval probes
    * still quarantine verbatim train twins.
    *
    * Shape at 100 TB: gram strings are md5'd to 16-byte keys before
    * the distinct/join (the maximalDupSpans move — only narrow hashes
    * shuffle); the eval side is one distinct over the (small) eval
    * arm's grams; the membership join is a narrow equi-join AQE can
    * broadcast when eval is small. One corpus shingling pass feeds
    * both sides.
    *
    * CONTRACT: `idCol` must uniquely identify rows AND be non-null
    * (stricter than [[graft.ops.Bpe.encodeViaDict]]'s unique-only
    * contract: here the shared-gram aggregate merges on the id, so
    * duplicates would blend two documents' counts and stamp a joint
    * quarantine verdict on both, and NULL ids would slip every
    * equi-join silently). Duplicate or null ids raise a typed error
    * at execution; the detector aggregates
    * IDS ONLY (column-pruned scan, map-side combine) and is empty
    * under the contract, so its guard join is broadcast-trivial —
    * a full-corpus window here would have re-shuffled the text. */
  def decontaminatedSplit(df: DataFrame, idCol: String, textCol: String,
      key: Column, splits: Seq[(String, Double)], evalSplit: String,
      n: Int = 8, labelCol: String = "split",
      quarantineLabel: String = "quarantine"): DataFrame = {
    require(splits.exists(_._1 == evalSplit),
      s"evalSplit '$evalSplit' is not one of ${splits.map(_._1)}")
    require(!splits.exists(_._1 == quarantineLabel),
      s"quarantineLabel '$quarantineLabel' collides with a split arm")
    val labeled = splitByHash(df, key, splits, labelCol)
    val grams = labeled.select(col(idCol).as("__gid"), col(labelCol).as("__lb"),
        explode(Dedup.wordShingles(TextAnalysis.tokens(col(textCol)), n))
          .as("g"))
      .select(col("__gid"), col("__lb"), md5(col("g")).as("gh"))
    val evalG = grams.filter(col("__lb") === evalSplit)
      .select(col("gh")).distinct()
    val shared = grams.filter(col("__lb") =!= evalSplit)
      .join(evalG, Seq("gh"))
      // wordShingles emits DISTINCT grams per doc, so this count is the
      // number of distinct leaked grams, not occurrence-inflated
      .groupBy(col("__gid")).agg(count(lit(1)).as("n_shared_grams"))
    val dupIds = df.groupBy(col(idCol).as("__did"))
      .agg(count(lit(1)).as("__nrows")).filter(col("__nrows") > 1L)
    // the isNull arm below carries ALL null-id detection (a plain
    // equi-join never matches a NULL id, so __nrows stays null for
    // null-id rows — which is fine: they raise on the id itself)
    labeled.join(shared, labeled(idCol) === shared("__gid"), "left")
      .join(dupIds, labeled(idCol) === dupIds("__did"), "left")
      .withColumn(labelCol,
        when(col("__nrows").isNotNull || col(idCol).isNull, raise_error(concat(
          lit("Sampling.decontaminatedSplit: duplicate or null id "),
          coalesce(col(idCol).cast("string"), lit("NULL")),
          lit(" - ids must be unique and non-null"))))
          .when(col(labelCol) =!= evalSplit && col("n_shared_grams").isNotNull,
            lit(quarantineLabel))
          .otherwise(col(labelCol)))
      .withColumn("n_shared_grams", coalesce(col("n_shared_grams"), lit(0L)))
      .drop("__gid", "__did", "__nrows")
  }

  /** Validated CASE arms for a split spec: (name, cumulative-threshold
    * hex) pairs for every split but the last, plus the ELSE name — the
    * single source both [[splitLabel]] (Column) and the `graft_split`
    * SQL builder plan from, so the two surfaces stay identical. */
  def splitArms(splits: Seq[(String, Double)]): (Seq[(String, String)], String) = {
    require(splits.nonEmpty, "at least one split required")
    splits.foreach { case (n, w) => require(w > 0.0, s"split $n weight $w not > 0") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights sum to $total, expected 1.0")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    (splits.map(_._1).dropRight(1).zip(cums.dropRight(1).map(hexThresholdLex)),
      splits.last._1)
  }

  /** The label expression behind [[splitByHash]], exposed so the SQL
    * surface (`graft_split`) plans the identical CASE. */
  def splitLabel(key: Column, splits: Seq[(String, Double)]): Column = {
    val (arms, last) = splitArms(splits)
    val h = substring(md5(key.cast("string")), 1, 12)
    // first-matching-interval CASE; the last arm is the ELSE so rounding
    // in the final cumulative weight can never leave a row unlabeled
    arms.foldRight(lit(last): Column) { case ((nm, thr), acc) =>
      when(h < lit(thr), lit(nm)).otherwise(acc)
    }
  }

  /** The keep-predicate behind [[bernoulliByHash]], exposed so the SQL
    * surface (`graft_keep`) plans the identical filter. Fractions ≥ 1.0
    * use the `"g"` sentinel, so keep-everything stays exact. */
  def keepPredicate(key: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    substring(md5(key.cast("string")), 1, 12) < lit(hexThresholdLex(fraction))
  }

  /** Temperature-scaled mixture caps — the T5 / multilingual-pretraining
    * α = 0.5 rule: per-domain keep caps proportional to √(domain size),
    * scaled so the caps total ≤ `budget` rows. Dominant domains are
    * flattened (a 100× bigger domain gets only 10× the rows) while
    * rare domains keep proportionally more — the standard compromise
    * between proportional sampling (head domains drown the tail) and
    * uniform (tail noise drowns the head).
    *
    * Exact cross-engine arithmetic: √n goes through the
    * round(x·weightScale)→LONG stable conversion (IEEE sqrt is
    * correctly rounded in both engines, and the quantized weights then
    * SUM exactly — a raw double Σ√n would be summation-order
    * dependent); cap = sw·budget div Σsw in pure integer arithmetic
    * with a typed raise if sw·budget would overflow. Flooring loses at
    * most one row per domain vs the real-valued allocation —
    * Σ caps ≤ budget always holds. Selection inside a domain is the
    * [[stratifiedByHash]] md5-rank (deterministic, engine-replayable);
    * the rank limit is per-domain DATA, so Spark's constant-limit
    * WindowGroupLimit rewrite can never fire — the skew guard is built
    * in manually instead: a partial rank inside each (domain, input
    * partition) filtered against the cap bounds what the final
    * per-domain rank sees at cap × numPartitions (any row in the final
    * top-cap is in its input partition's top-cap), so a hot domain
    * ("en" at 90% of a 100 TB corpus) never funnels its whole row set
    * into one sort task — the same two-stage contract as
    * [[stratifiedByHash]]. The per-domain stats/caps frame is
    * domain-bounded and broadcast. */
  def temperatureCap(df: DataFrame, domainCol: String, key: Column,
      budget: Long, weightScale: Long = 1000000L): DataFrame = {
    require(budget >= 1L, s"temperatureCap: budget $budget must be >= 1")
    require(weightScale >= 1L,
      s"temperatureCap: weightScale $weightScale must be >= 1")
    val weights = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__sw",
        round(sqrt(col("__n").cast("double")) * lit(weightScale.toDouble))
          .cast("long"))
    // domain-bounded frame: the empty-partition window is over one row
    // per domain, never the corpus
    val caps = weights
      .withColumn("__tw", sum(col("__sw")).over(Window.partitionBy()))
      .select(col(domainCol),
        when(col("__sw") > lit(Long.MaxValue / budget),
          raise_error(concat(
            lit("Sampling.temperatureCap: weight x budget overflows long "),
            lit(s"(budget=$budget) - shrink weightScale"))).cast("long"))
          .otherwise(org.apache.spark.sql.functions.call_function("div",
            col("__sw") * lit(budget), col("__tw"))).as("__cap"))
    val h = md5(key.cast("string"))
    val partial =
      Window.partitionBy(col(domainCol), spark_partition_id()).orderBy(h, key)
    val fin = Window.partitionBy(col(domainCol)).orderBy(h, key)
    // null-safe join (the round-6 null-key class): a NULL domain is a
    // legal group — it was counted into the weight total, so a plain
    // equi-join would silently DROP its rows while still shrinking
    // every real domain's cap
    df.join(broadcast(caps.withColumnRenamed(domainCol, "__cap_dom")),
        col(domainCol) <=> col("__cap_dom"))
      .withColumn("__pr", row_number().over(partial))
      .filter(col("__pr") <= col("__cap")).drop("__pr")
      .withColumn("__rn", row_number().over(fin))
      .filter(col("__rn") <= col("__cap"))
      .drop("__rn", "__cap", "__cap_dom")
  }

  /** Token-budget mixture planning (deterministic integer waterfilling):
    * given per-domain token supplies, integer target weights, and a
    * total token budget, compute how many tokens to draw per domain so
    * the mix follows the weights until a scarce domain SATURATES (its
    * whole supply is taken) and its unmet share re-flows to the
    * remaining domains — the standard "compose a pretraining mix under
    * a budget" step (e.g. The Pile / Gopher-style mixture tables).
    *
    * Exact integer arithmetic throughout (quota = rem·w // ΣW, trunc):
    * the plan is a pure function of (supplies, weights, budget),
    * reproducible anywhere — including the DuckDB oracle, which replays
    * the saturation waves as unrolled CTE iterations (gate p14).
    * `iterations` bounds the saturation waves; once no wave saturates a
    * new domain the state is a fixed point, so extra iterations are
    * no-ops (6 covers any ≤6-wave instance; worst case = #domains).
    *
    * Driver-side on the collected per-domain stats — model-sized input
    * (one row per domain), like k-means centroids. The resulting
    * fractions feed [[mixtureByHash]] for the distributed draw.
    *
    * @param domainStats (domain: string, tokens: long) — one row per domain
    * @param weights     integer target weights per domain (missing ⇒ 0)
    * @param budget      total tokens to allocate; if ≥ Σ supplies every
    *                    positively-weighted domain saturates (alloc =
    *                    its supply; zero-weight domains always draw 0)
    * @return (domain, tokens, alloc, fraction_ppb) with fraction_ppb =
    *         alloc·10⁹ // tokens — the per-domain sampling rate in
    *         parts-per-billion */
  def tokenBudgetPlan(domainStats: DataFrame, weights: Map[String, Long],
      budget: Long, iterations: Int = 6): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    weights.foreach { case (d, w) => require(w >= 0, s"weight $w for $d is negative") }
    // quota arithmetic (rem·w) must stay inside 64 bits on BOTH engines
    // (DuckDB BIGINT multiplication errors on overflow rather than
    // widening) — small integer weights are the natural mixture spec
    val maxW = (weights.values ++ Seq(1L)).max
    require(maxW <= 1000000L && budget <= Long.MaxValue / math.max(maxW, 1L),
      "weights must be ≤ 1e6 and budget·maxWeight within 64 bits")
    val spark = domainStats.sparkSession
    val rows = domainStats.select(col("domain").cast("string"),
      col("tokens").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var state = rows.map { case (d, t) =>
      (d, t, weights.getOrElse(d, 0L), t == 0L || weights.getOrElse(d, 0L) == 0L, 0L)
    } // (domain, tokens, w, saturated, alloc) — zero-weight/empty start saturated at 0
    var i = 0
    while (i < iterations) {
      val rem = budget - state.filter(_._4).map(_._5).sum
      val wa = state.filterNot(_._4).map(_._3).sum
      if (wa > 0L) state = state.map { case s @ (d, t, w, sat, _) =>
        if (sat) s
        else if (rem * w / wa >= t) (d, t, w, true, t) // saturates: take all
        else s
      }
      i += 1
    }
    val rem = budget - state.filter(_._4).map(_._5).sum
    val wa = state.filterNot(_._4).map(_._3).sum
    val fin = state.map { case (d, t, w, sat, a) =>
      // capped at the supply: an instance needing MORE saturation waves
      // than `iterations` must still never plan alloc > tokens (the
      // excess is undrawable and fraction_ppb would exceed 1e9)
      val alloc = if (sat) a else math.min(rem * w / wa, t)
      // BigInt: alloc·1e9 overflows Long for allocations > ~9.2e9
      // tokens (routine at pretraining scale); the quotient ≤ 1e9 fits
      (d, t, alloc,
        if (t == 0L) 0L else (BigInt(alloc) * 1000000000L / t).toLong)
    }
    import spark.implicits._
    fin.toSeq.toDF("domain", "tokens", "alloc", "fraction_ppb")
  }
}
