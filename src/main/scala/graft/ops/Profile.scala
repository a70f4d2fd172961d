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
}
