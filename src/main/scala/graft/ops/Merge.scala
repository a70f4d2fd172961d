package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance merges — the operations a training-data
  * pipeline runs every time a new crawl batch lands on a 100 TB corpus
  * snapshot (extension tier; the reference's closest surface is SQLite's
  * INSERT…ON CONFLICT, which can never fire on file-loaded tables — no
  * unique constraints — so this family lives at the operator level, not
  * in the SQL dialect).
  *
  * Scale shape: every merge is ONE equi-join on the key columns plus a
  * union — no windows over the target, no driver materialization. When
  * the incoming batch is small relative to the corpus (the common case:
  * daily delta vs full snapshot) Spark's AQE broadcasts the batch side
  * automatically, making the whole merge a map-side pass over the
  * target. [[applyChanges]] adds one window over the CHANGE BATCH only
  * (latest-per-key), never over the target.
  */
object Merge {

  /** Whole-row upsert (SCD-1 "source wins"): target rows whose key
    * matches a source row are REPLACED by it; unmatched source rows are
    * inserted; everything else survives unchanged. Exactly one
    * anti-join + union — the delete-and-insert formulation, which
    * shuffles only on the keys and never rewrites untouched columns.
    *
    * Duplicate keys WITHIN source are kept as-is (caller dedups, e.g.
    * via [[applyChanges]] with a sequence column); source must be
    * union-compatible with target by name. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val kept = target.join(source.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(source.select(target.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
  }

  /** Column-level upsert: matched rows take ONLY `updateCols` from
    * source (other columns keep their target values); unmatched source
    * rows insert whole. One full-outer join on the keys.
    *
    * The SCD-1 shape for wide tables where the delta carries a few
    * refreshed columns (quality score, dedup cluster id) and rewriting
    * the whole row would churn every downstream column. */
  def upsertColumns(target: DataFrame, source: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsertColumns needs at least one key column")
    val bad = updateCols.filterNot(target.columns.contains)
    require(bad.isEmpty, s"unknown update columns: ${bad.mkString(", ")}")
    val t = target.alias("__t")
    val s = source.alias("__s")
    val joined = t.join(s, keys, "full_outer")
    // presence probes: any key column is non-null on that side iff the
    // side matched (keys are non-null by merge contract)
    val tPresent = col(s"__t.`${keys.head}`").isNotNull
    val out = target.columns.map { c =>
      val tc = col(s"__t.`$c`")
      val sc = col(s"__s.`$c`")
      if (keys.contains(c)) coalesce(tc, sc).as(c)
      else if (updateCols.contains(c)) when(sPresent(s, keys), sc).otherwise(tc).as(c)
      else when(tPresent, tc).otherwise(sc).as(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  private def sPresent(s: DataFrame, keys: Seq[String]): Column =
    col(s"__s.`${keys.head}`").isNotNull

  /** CDC apply: fold a change batch carrying an op column
    * (I/U = upsert, D = delete) and a monotone sequence column into the
    * target. Per key, only the LATEST change (max `seqCol`) applies —
    * an insert followed by a delete in the same batch nets to absence.
    *
    * The window runs over the change batch only (small side); the
    * target sees a single anti-join + union, so a 100 TB snapshot is
    * never sorted or windowed. Ties on `seqCol` break deterministically:
    * a delete beats any upsert (a tie means the producer emitted both
    * with one sequence number; converging to "gone" is the safe side),
    * and equal-seq upserts with different payloads — CDC streams emit
    * duplicates across producer restarts — break by a hash of the whole
    * row: an arbitrary but RUN-STABLE pick, so the merged table never
    * depends on partition order.
    *
    * @param changes target columns + `opCol` + `seqCol`
    * @param opCol   'I' | 'U' | 'D' (I and U are both upserts — CDC
    *                streams routinely mislabel them across restarts).
    *                Anything else — including NULL — fails the job: a
    *                NULL op would otherwise make `op =!= "D"` evaluate
    *                to NULL and silently DELETE the row (dropped from
    *                upserts while its key still lands in `touched`),
    *                and an unrecognized op would silently upsert.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    // per-row validation, not a driver-side scan: raise_error fires on the
    // first bad row wherever it lives, with zero extra jobs or shuffles
    val opU = when(upper(col(opCol)).isin("I", "U", "D"), upper(col(opCol)))
      .otherwise(raise_error(concat(
        lit(s"applyChanges: $opCol must be I/U/D, got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc,
        when(opU === "D", lit(0)).otherwise(lit(1)).asc,
        // full-row hash completes the ordering: equal-seq duplicate
        // upserts pick the same winner under any partitioning. Hash the
        // JSON form, not the raw columns: xxhash64 rejects MapType
        // columns outright, and it folds null children WITHOUT mixing —
        // (null, 5) and (5, null) would collide, re-admitting the
        // partition-order nondeterminism. to_json keys every value by
        // field name, so null shifts change the hash, and it accepts
        // maps/arrays/structs/binary.
        xxhash64(to_json(struct(changes.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))))
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = latest.filter(opU =!= "D")
      .select(target.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
    // every change key has a latest row, so the touched-key set is just
    // the distinct change keys — cheaper than re-deriving (and
    // re-planning) the window on this branch
    val touched = changes.select(keys.map(col): _*).distinct()
    val kept = target.join(touched, keys, "left_anti")
    kept.unionByName(upserts)
  }
}
