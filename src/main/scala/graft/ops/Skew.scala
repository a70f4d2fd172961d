package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (the classic 100 TB failure: one hot key lands one task with
  * hours of work while 999 executors idle).
  *
  * Spark's AQE skew-join handles sort-merge skew automatically when
  * statistics expose it; explicit salting remains necessary when the
  * skewed side must hash-join, or the hot keys are known a priori.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a random salt in
    * [0, saltFactor); the small side is replicated `saltFactor`× with
    * every salt value; the join key becomes (key, salt), splitting each
    * hot key across `saltFactor` tasks.
    *
    * Deterministic variant: salt is derived from a hash of the whole big
    * row (`xxhash64` over all columns), not `rand()`, so results are
    * reproducible run-to-run.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched small-side row once per
    // salt replica — only join types that preserve the big side are sound
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(c => col(s"`$c`")).toSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop(replicated(key)).drop(salted("__salt")).drop(replicated("__salt"))
  }

  /** Top-N key frequencies for a column — cheap skew diagnosis before
    * choosing a strategy (broadcast, salt, or AQE default). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)

  /** One-row join-planning stats from SKETCHES ONLY — what you read
    * before choosing broadcast / salt / AQE-default for an equi-join.
    * Cost: two bounded-artifact sketch builds per side (a CM and a KMV —
    * one scan each). At 100 TB use [[joinPlanStatsFromSketches]] with
    * persisted sketches instead ([[Sketch.writeCmIndex]]/
    * [[Sketch.writeKmvIndex]]) — the corpus pass is then already paid:
    *
    *   - `rows_a`/`rows_b` — exact JOINABLE row counts (a CM depth
    *     row's total);
    *   - `distinct_a`/`distinct_b` — KMV distinct-key estimates
    *     (exact below k);
    *   - `est_join_rows` — the CM inner-product estimate of the join
    *     output size ([[Sketch.cmInnerProduct]], NEVER an undercount);
    *   - `est_fanout_a` — est_join_rows / rows_a: how many output rows
    *     each left row spawns on average. est_join_rows ≫ rows_a+rows_b
    *     with low distinct counts is the many-to-many blow-up you salt
    *     or pre-aggregate BEFORE running, not after the stage dies.
    *
    * Every stat covers NON-NULL-key rows only (the sketches filter null
    * values): null keys never match an equi-join, so they belong in
    * none of est_join_rows/fan-out/distinct — but it also means rows_*
    * UNDERSTATES a nullable-keyed table's physical size; add the null
    * count separately before byte-sizing a broadcast. Always returns
    * EXACTLY one row — empty or all-null sides read as zeros;
    * est_join_rows saturates at Long.MaxValue (an estimate past 2⁶³ is
    * already the loudest possible "do not run this join as-is"). The
    * final assembly cross-joins five 1-row frames — the documented
    * benign scalar-subquery BNLJ shape. */
  def joinPlanStats(a: DataFrame, b: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024, k: Int = 256): DataFrame = {
    def side(df: DataFrame) = df.select(lit("all").as("__k"), col(keyCol).as("__v"))
    joinPlanStatsFromSketches(
      Sketch.cmSketch(side(a), "__k", "__v", depth, width),
      Sketch.cmSketch(side(b), "__k", "__v", depth, width),
      Sketch.kmvSketch(side(a), "__k", "__v", k),
      Sketch.kmvSketch(side(b), "__k", "__v", k), depth, k)
  }

  /** [[joinPlanStats]] over PRE-BUILT sketch frames — the 100 TB path:
    * the corpus pass is paid once when the sketches are persisted
    * ([[Sketch.writeCmIndex]]/[[Sketch.writeKmvIndex]]), and every
    * planning decision afterwards reads bounded artifacts only.
    *
    * `cmA`/`cmB`: CM sketch frames as from [[Sketch.cmSketch]] — or a
    * `readCmIndex` segment frame directly (the inner product merges
    * segments internally, and the row totals sum correctly across
    * segments). `kmvA`/`kmvB`: KMV sketch frames as from
    * [[Sketch.kmvSketch]]; merge an un-compacted index's segments with
    * [[Sketch.kmvMerge]] first (two `hashes` rows per key would
    * double-count). All four must be built over the SAME single-group
    * literal key with value = the join key. */
  def joinPlanStatsFromSketches(cmA: DataFrame, cmB: DataFrame,
      kmvA: DataFrame, kmvB: DataFrame, depth: Int = 4,
      k: Int = 256): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // each leg is a GLOBAL aggregate over its (possibly empty) keyed
    // frame: global aggs always emit one row, so an empty/all-null side
    // cannot annihilate the cross-join chain — it reads as 0. The
    // estimate stays DECIMAL until after the saturation clamp: a
    // blow-up estimate past 2⁶³ must not crash the very call that
    // exists to warn about it (coalesce BEFORE least — Spark's least
    // skips nulls, so least(null, max) would read max on empty input)
    val est = Sketch.cmInnerProduct(cmA, cmB, depth)
      .agg(least(coalesce(sum(col("est_inner")), lit(0L).cast(dec)),
        lit(Long.MaxValue).cast(dec)).cast("long").as("est_join_rows"))
    def rows(sk: DataFrame, n: String) = sk.filter(col("di") === 0)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as(n))
    def dist(sk: DataFrame, n: String) =
      Sketch.kmvEstimate(sk, k)
        .agg(coalesce(sum(col("est_distinct")), lit(0L)).as(n))
    rows(cmA, "rows_a").crossJoin(rows(cmB, "rows_b"))
      .crossJoin(dist(kmvA, "distinct_a")).crossJoin(dist(kmvB, "distinct_b"))
      .crossJoin(est)
      .withColumn("est_fanout_a",
        when(col("rows_a") > 0L,
          col("est_join_rows").cast("double") / col("rows_a").cast("double"))
          .otherwise(lit(0.0)))
  }
}
