package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free repeated joins —
  * the 100 TB answer to "this pipeline joins the same two huge tables on
  * the same key every day": pay the partitioning shuffle ONCE at write
  * time, then every subsequent equi-join (and aggregation) on the bucket
  * key plans with zero Exchange on the bucketed sides.
  *
  * Spark only exploits bucketing through the catalog (`spark.table`), so
  * these are `saveAsTable` writes; pass `path` to keep the data external
  * (dropping the table entry leaves the files). Both join sides must use
  * the SAME bucket count and key for the co-located plan — mismatched
  * counts silently fall back to a normal shuffle join, which is why
  * [[coLocatedJoin]] checks the metadata up front instead of letting the
  * plan degrade quietly.
  *
  * Scale notes: each bucket is written by the task that owns it after a
  * hash repartition on the key, so files-per-table = numBuckets (not
  * tasks × buckets); size numBuckets so one bucket of the LARGER table
  * fits an executor's sort-merge spill budget (e.g. ~1 GiB/bucket).
  * Sorting within buckets (`sortBy`) lets the join skip the sort phase
  * entirely on unchanged data.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      path: Option[String] = None, mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val w = df.write.mode(mode).bucketBy(numBuckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Bucket spec (key, count) of a catalog table, if bucketed. */
  def bucketSpecOf(spark: SparkSession, table: String): Option[(String, Int)] = {
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    meta.bucketSpec.collect {
      case b if b.bucketColumnNames.size == 1 => (b.bucketColumnNames.head, b.numBuckets)
    }
  }

  /** Equi-join two bucketed tables on their shared bucket key, failing
    * fast if the layouts are not co-located (different key or bucket
    * count) — the silent alternative is a full shuffle of both sides. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      joinType: String = "inner"): DataFrame = {
    val l = bucketSpecOf(spark, left).getOrElse(
      throw new IllegalArgumentException(s"$left is not single-key bucketed"))
    val r = bucketSpecOf(spark, right).getOrElse(
      throw new IllegalArgumentException(s"$right is not single-key bucketed"))
    require(l == r,
      s"bucket layouts differ ($left=$l, $right=$r): the join would silently shuffle; " +
        "rewrite one side with writeBucketed at the shared spec")
    spark.table(left).join(spark.table(right), Seq(l._1), joinType)
  }
}
