package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step event analytics: conversion funnels and retention
  * cohorts over an event log `(user, ts, type)`.
  *
  * Both are pure aggregate/join compositions — k tiny shuffles on the
  * user key for a k-step funnel, two for retention — so they inherit
  * Spark's scale story unchanged: no windows over whole user histories,
  * no per-user collect, state per aggregate is one timestamp. At 100 TB
  * the user-key shuffles are the lower bound for any per-user funnel.
  */
object Funnel {

  /** Strictly-ordered conversion funnel: a user reaches step i when an
    * event of `steps(i)` occurs strictly AFTER their step-(i−1) match
    * and within `maxGapUs` microseconds of it; the match is the EARLIEST
    * such event (min-ts semantics, deterministic under ties because a
    * min over equal timestamps is one value). Step 0 = the user's first
    * `steps(0)` event.
    *
    * Returns one row per step: `step_idx` (int), `step` (string),
    * `users` (long — users reaching the step), `total_lag_us` (long —
    * summed µs between this step's match and the previous one's; 0 for
    * step 0). The lag sum accumulates exact integer µs in DECIMAL(38,0)
    * and casts back to long, so it is parallelism-independent and raises
    * (ANSI cast) rather than wrapping past 2⁶³.
    *
    * NULL users/timestamps never participate (SQL comparison semantics).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxGapUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapUs > 0, s"funnel maxGapUs must be > 0, got $maxGapUs")
    val ev = events
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(typeCol).as("__t"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull)

    // per-step frames: __u plus __ts0..__tsi (each step's matched ts).
    // Each frame embeds the previous ONCE (linear plan growth — not the
    // lazy-max doubling class), and the per-step summary aggregates are
    // row-count-sized, so recomputation across the k summaries is k
    // small jobs, not a doubled plan.
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val matched = prev match {
          case None =>
            ev.filter(col("__t") === step)
              .groupBy(col("__u")).agg(min(col("__ts")).as("__ts0"))
          case Some(p) =>
            val prevTs = col(s"__ts${i - 1}")
            val keys = col("__u") +: (0 until i).map(k => col(s"__ts$k"))
            ev.filter(col("__t") === step).join(p, Seq("__u"))
              .filter(col("__ts") > prevTs &&
                unix_micros(col("__ts")) - unix_micros(prevTs) <= maxGapUs)
              .groupBy(keys: _*).agg(min(col("__ts")).as(s"__ts$i"))
        }
        Some(matched)
    }.flatten

    val summaries = perStep.zipWithIndex.map { case (df, i) =>
      val lag =
        if (i == 0) lit(0L)
        else coalesce(
          sum((unix_micros(col(s"__ts$i")) - unix_micros(col(s"__ts${i - 1}")))
            .cast("decimal(20,0)")).cast("decimal(38,0)"), lit(0).cast("decimal(38,0)"))
          .cast("long")
      df.agg(count(lit(1)).as("users"), lag.as("total_lag_us"))
        .select(lit(i).as("step_idx"), lit(steps(i)).as("step"),
          col("users"), col("total_lag_us"))
    }
    summaries.reduce(_ unionByName _)
  }

  /** Weekly retention cohorts: cohort = the user's first activity week,
    * a cell = users from that cohort active `week_offset` weeks later.
    * Output: `cohort_week` (long — weeks since `epochAnchor`),
    * `week_offset` (long ≥ 0), `users` (long).
    *
    * Week index = truncating integer division of the day difference from
    * `epochAnchor` by 7 — identical in Spark (`div`) and DuckDB (`//`)
    * on ALL signs (both truncate toward zero; the round-10 correction),
    * though for timestamps BEFORE the anchor the "week" boundary is a
    * truncation, not a floor — pick an anchor at or before the data's
    * min date (default: 1970-01-05, the first ISO Monday of the epoch,
    * so weeks are Monday-aligned).
    *
    * Activity is de-duplicated to (user, week) BEFORE counting, so the
    * final cell count is a plain `count(*)` — no count-distinct
    * two-exchange expansion (the round-6 note).
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      epochAnchor: String = "1970-01-05"): DataFrame = {
    val wk = call_function("div",
      datediff(col("__d"), lit(epochAnchor).cast("date")), lit(7))
    val act = events
      .select(col(userCol).as("__u"), col(tsCol).cast("date").as("__d"))
      .filter(col("__u").isNotNull && col("__d").isNotNull)
      .select(col("__u"), wk.as("__w"))
      .dropDuplicates("__u", "__w")
    val cohort = act.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    act.join(cohort, Seq("__u"))
      .groupBy(col("__cw").as("cohort_week"),
        (col("__w") - col("__cw")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
