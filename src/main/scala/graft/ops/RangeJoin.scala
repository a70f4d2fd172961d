package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed interval-containment (range) join: match each point row to the
  * interval rows of the same key with `start <= point_ts <= end`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop (quadratic
  * blowup at scale). This implementation bins time into fixed-width
  * cells: each interval explodes into the cells it covers, each point
  * maps to one cell, candidates come from an EQUI-join on (key, cell),
  * and the exact containment predicate filters them. Candidate volume is
  * |points| + |intervals| × (span/binWidth) — linear, shuffle keyed on
  * (key, cell), skew-safe for bounded interval spans. Pick `binSeconds`
  * on the order of the median interval length: an interval spanning k
  * bins emits k candidate rows, so wildly longer-than-bin intervals
  * should be split or given a larger bin.
  */
object RangeJoin {

  /** @param payloadCols interval-side columns to attach (prefixed). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
      pointTsCol: String, startCol: String, endCol: String,
      payloadCols: Seq[String], binSeconds: Long = 3600,
      intervalPrefix: String = "iv_"): DataFrame = {
    val binUs = binSeconds * 1000000L
    val ivPayload = struct(payloadCols.map(c => col(s"`$c`")): _*)
    val iv = intervals.select(col(s"`$keyCol`").as("__k"),
        col(s"`$startCol`").as("__start"), col(s"`$endCol`").as("__end"),
        ivPayload.as("__p"))
      .withColumn("__cell", explode(sequence(
        unix_micros(col("__start")).divide(binUs).cast("long"),
        unix_micros(col("__end")).divide(binUs).cast("long"))))
    val pt = points.withColumn("__k", col(s"`$keyCol`"))
      .withColumn("__cell", unix_micros(col(s"`$pointTsCol`")).divide(binUs).cast("long"))
    val matched = pt.join(iv, Seq("__k", "__cell"))
      .filter(col(s"`$pointTsCol`") >= col("__start")
        && col(s"`$pointTsCol`") <= col("__end"))
    val pointCols = points.columns.map(c => col(s"`$c`"))
    val payloadOut = payloadCols.map(c => col("__p").getField(c).as(s"$intervalPrefix$c"))
    // each point lives in exactly one cell and each interval lists every
    // covered cell once, so (point, interval) pairs are already unique —
    // no dedup shuffle needed
    matched.select((pointCols ++ payloadOut).toSeq: _*)
  }
}
