package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style data-quality snapshot a pipeline
  * runs before trusting a new corpus drop: one report row per profiled
  * column. The reference's type-inference pass reads every value to
  * classify columns (`model.go` §1.3); this is the same
  * whole-table-scan family generalized into the report a 100 TB
  * ingest actually wants (null rates, cardinality, ranges, dominant
  * values) — and it composes the repo's own sketch algebra instead of
  * exact distinct counting.
  *
  * Columns are profiled in their STRING canonical form (one shared
  * narrow pipeline regardless of table width or column types;
  * typed min/max stays one SQL query away). Report per column:
  *   - `n_rows`, `n_null`
  *   - `n_distinct_est` — KMV ([[Sketch.kmvSketch]]/[[Sketch
  *     .kmvEstimate]]): exact below k, (k−1)/U_(k) above — bounded
  *     state per column at any cardinality
  *   - `min_v` / `max_v` — byte-order string min/max (engine-portable
  *     binary collation)
  *   - `avg_len` — mean string length over non-null values: exact LONG
  *     sum / exact count, ONE double division (cross-engine bitwise)
  *   - `top_value` / `top_count` — the exact mode (smallest value on
  *     count ties), computed aggregate-only: value counts → per-column
  *     max → min value at the max. No windows — a per-column window
  *     would sort each column's whole distinct-value set in one
  *     partition (the skew trap the two-stage aggregate avoids).
  *
  * Scale shape: unpivot to (column, value) narrow rows, then TWO
  * aggregate passes over the union (each a column-pruned parquet scan
  * per profiled column): one fused stats+KMV aggregate (the sketch is
  * a [[Sketch.kmvAgg]] buffer riding in the same groupBy — nulls
  * skipped by the aggregator), and the value-counts aggregate for the
  * mode — the only corpus-cardinality shuffle.
  */
object Profile {

  def tableProfile(df: DataFrame, cols: Seq[String],
      kmvK: Int = 64): DataFrame = {
    require(cols.nonEmpty, "tableProfile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"tableProfile: no such column(s): $missing")
    // a duplicated name would union the same column twice under one
    // label: n_rows/n_null/mode counts silently double while the
    // distinct estimate doesn't — an inconsistent report, so reject
    require(cols.distinct.size == cols.size,
      s"tableProfile: duplicate column(s): ${
        cols.diff(cols.distinct).distinct.mkString(", ")}")
    val narrow = cols.map { c =>
      df.select(lit(c).as("column"), col(c).cast("string").as("v"))
    }.reduce(_ unionByName _)

    // one fused pass: counting stats + the KMV sketch buffer; an
    // all-null column yields an empty sketch -> estimate 0 via the
    // exact (size < k) arm
    val stats = narrow.groupBy(col("column")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        when(count(col("v")) > 0,
          sum(length(col("v"))).cast("double") /
            count(col("v")).cast("double")).as("avg_len"),
        Sketch.kmvAgg(Sketch.valueHash60(col("v")), kmvK).as("__hashes"))
      .withColumn("n_distinct_est",
        Sketch.kmvEstimateExpr(col("__hashes"), kmvK))

    // exact mode, aggregate-only (see scaladoc): counts -> max -> min
    // value at the max
    val vc = narrow.filter(col("v").isNotNull)
      .groupBy(col("column"), col("v")).agg(count(lit(1)).as("cnt"))
    val top = vc.join(
        vc.groupBy(col("column")).agg(max(col("cnt")).as("top_count")),
        Seq("column"))
      .filter(col("cnt") === col("top_count"))
      .groupBy(col("column"))
      .agg(min(col("v")).as("top_value"), max(col("top_count")).as("top_count"))

    stats
      .join(top, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct_est"), col("min_v"), col("max_v"), col("avg_len"),
        col("top_value"), col("top_count"))
  }

  /** Windowed COUNT-anomaly detection — the "did this event type spike
    * today" observability check, entirely in exact integer arithmetic:
    * daily counts per `typeCol`, a trailing baseline of the previous
    * `trailing` OBSERVED windows (ROWS frame — sparse days are treated
    * as adjacent, documented), and the z²-test rewritten
    * transcendental-free: flag iff `(n·x − s)² > k²·(n·q − s²)` where
    * `n`/`s`/`q` are the baseline's count / sum / sum-of-squares — the
    * σ-denominator cleared, so no sqrt, no doubles, and DuckDB replays
    * the flags bitwise. Zero-variance baselines flag ANY deviation
    * (lhs > 0 = rhs 0). Rows with fewer than `trailing` baseline
    * windows report `anomaly = 0` (insufficient history, never a
    * false alarm). The squares run in DECIMAL(38,0) (HUGEINT on the
    * oracle side) — a LONG square overflows at ~3e9 counts/window.
    *
    * Shape at 100 TB: one hash aggregate (map-side combinable) down to
    * (type, day) rows — the window functions then run on the
    * AGGREGATED frame (days × types, not events), partitioned by type.
    *
    * @return (typeCol, day timestamp, cnt, n, s, anomaly int) */
  def countAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      trailing: Int = 7, k: Int = 3): DataFrame = {
    require(trailing >= 1 && k >= 1,
      s"countAnomalies trailing=$trailing k=$k out of range")
    val cnts = events.filter(col(tsCol).isNotNull)
      .groupBy(col(typeCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    countAnomaliesFromCounts(cnts, typeCol, trailing, k)
  }

  /** [[countAnomalies]] over PRE-AGGREGATED `(typeCol, day, cnt)` rows —
    * the entry the gate's planted-spike fixture and any externally
    * aggregated feed use. */
  def countAnomaliesFromCounts(cnts: DataFrame, typeCol: String,
      trailing: Int = 7, k: Int = 3): DataFrame = {
    val reserved = Seq("day", "cnt", "n", "s", "q", "anomaly")
    require(!reserved.contains(typeCol),
      s"countAnomalies: typeCol $typeCol collides with an internal/output " +
        "column name")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(-trailing, -1)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cnts
      .withColumn("n", count(col("cnt")).over(w))
      .withColumn("s", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("q", coalesce(sum(dec(col("cnt")) * dec(col("cnt"))).over(w),
        dec(lit(0L))))
      .select(col(typeCol), col("day"), col("cnt"), col("n"), col("s"),
        when(col("n") === trailing.toLong,
          (dec(col("n") * col("cnt") - col("s"))
            * dec(col("n") * col("cnt") - col("s"))
            > lit(k.toLong * k) * (dec(col("n")) * col("q")
              - dec(col("s")) * dec(col("s")))).cast("int"))
          .otherwise(lit(0)).as("anomaly"))
  }
}
