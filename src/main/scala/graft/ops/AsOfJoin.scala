package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join: for every left row, attach the single most recent
  * right row with the same key and `right.ts <= left.ts` (backward
  * direction, inclusive — the same matching rule as DuckDB/kdb ASOF JOIN
  * and pandas merge_asof defaults). Left rows with no prior right row
  * keep NULL payloads (left-join semantics).
  *
  * Spark has no built-in as-of join; the preference-ordered options in
  * this codebase start with "compose existing ops if semantics allow" —
  * and they do: the union + running-`last(ignoreNulls)` window
  * formulation costs ONE shuffle on the key and one per-partition sort,
  * which is also the lower bound for any as-of algorithm on unsorted
  * inputs. No custom physical operator can beat its shuffle shape; a
  * range-join would be O(matches) bigger. Scales to any size: state per
  * window is one payload struct. Skew note: one window task per key —
  * a single pathologically hot key serializes its own events; pre-split
  * such keys by a coarse time bucket and stitch at bucket boundaries.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach
    * @param rightPrefix prefix for the attached columns (collision-proof)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], rightPrefix: String = "asof_"): DataFrame = {
    val payloadStruct = struct(payloadCols.map(c => col(s"`$c`")): _*)
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType
    val leftStruct = struct(left.columns.map(c => col(s"`$c`")): _*)
    val leftType = left.select(leftStruct.as("l")).schema("l").dataType

    // union the two sides: right rows sort BEFORE left rows at equal ts
    // (__side 0 < 1), making the match inclusive (right.ts <= left.ts)
    val l = left.select(col(s"`$keyCol`").as("__k"), col(s"`$tsCol`").as("__ts"),
      lit(1).as("__side"), leftStruct.as("__l"), lit(null).cast(payloadType).as("__r"))
    // NULL-key / NULL-ts right rows can never be an as-of match (SQL
    // comparison semantics — DuckDB ASOF drops them too); left rows keep
    // left-join semantics regardless
    val r = right
      .filter(col(s"`$keyCol`").isNotNull && col(s"`$tsCol`").isNotNull)
      .select(col(s"`$keyCol`").as("__k"), col(s"`$tsCol`").as("__ts"),
        lit(0).as("__side"), lit(null).cast(leftType).as("__l"), payloadStruct.as("__r"))

    // __r as the final sort key makes the order total when several right
    // rows share (key, ts): the payload-max row wins deterministically
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = payloadCols.map(c =>
      col("__match").getField(c).as(s"$rightPrefix$c"))
    matched.select((leftCols ++ rightCols).toSeq: _*)
  }
}
