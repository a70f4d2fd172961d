package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering for
  * multi-dimensional file pruning.
  *
  * Parquet scans skip whole files/row-groups whose footer min/max
  * ranges miss the query predicate — but a table sorted by ONE column
  * leaves every OTHER column's range wide in every file, so 2-D box
  * queries (user × time, domain × quality, …) prune nothing. Writing in
  * Z-order interleaves the bits of two key columns, so each output file
  * covers a small rectangle of the key space and a box predicate
  * intersects only a few files — the standard lakehouse layout trick,
  * here with an exact-integer z-value both engines can recompute
  * (gate p15).
  *
  * Scale shape: the z-value is one per-row projection (16 exact
  * power-of-two steps — dividing a double by 2^i is lossless, and every
  * operand stays < 2^32); the write is one range repartition on z (the
  * same shuffle any global sort pays) + an in-partition sort. No
  * driver state.
  */
object Layout {

  /** Morton interleave of the LOW `bits` bits of two integer columns
    * (inputs are masked to those bits first, so negative or oversized
    * keys take their two's-complement low bits instead of producing
    * engine-divergent garbage): bit i of `a` lands at position 2i+1,
    * bit i of `b` at 2i. Unrolled to literal shift/mask terms — pure
    * integer whole-stage codegen, no higher-order function, no per-row
    * pow(); an external engine replays the same bits with floor
    * divisions by 2^i over the masked values. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits not in [1, 31]")
    val mask = lit((1L << bits) - 1L)
    val al = a.cast("long").bitwiseAND(mask)
    val bl = b.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Write `df` parquet-clustered in Z-order on two non-negative
    * integer key expressions: each of the `numFiles` output files
    * covers a contiguous z range ≈ a small rectangle of the (a, b) key
    * space, so box predicates on BOTH keys prune to a handful of files
    * (footer min/max skipping) where a single-column sort prunes only
    * its own column. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column — the write would silently replace it")
    val cols = df.columns.toSeq
    df.withColumn("__graft_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .select(cols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) ranges of two columns in a written table —
    * the footer statistics a pruning scan consults, surfaced so layout
    * quality is measurable: a box query's CANDIDATE files are those
    * whose ranges intersect the box. */
  def fileRanges(df: DataFrame, a: String, b: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("a_min"), max(col(a)).as("a_max"),
        min(col(b)).as("b_min"), max(col(b)).as("b_max"))
}
