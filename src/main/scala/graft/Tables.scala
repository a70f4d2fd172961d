package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-provided TPC-H-ish parquet dirs
  * (`/root/testdata/sf*`). One parquet file per table; see TESTDATA.md.
  *
  * Scale notes: these are plain `spark.read.parquet` scans — at cluster
  * scale the same code reads a partitioned directory; filters/projections
  * written against these DataFrames push down to the parquet scan
  * (verified via `.explain("formatted")` → PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Naive (isAdjustedToUTC=false) timestamp columns must infer as
    // TIMESTAMP, not TIMESTAMP_NTZ: sessions run UTC, so the values match
    // DuckDB's naive-timestamp read and every ts function stays applicable.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    name match {
      case "events" =>
        // events.ts has been TIMESTAMP(NANOS) parquet, which Spark rejects
        // by default: read nanos as long, floor-divide to micros — the same
        // truncation DuckDB applies, so oracle values agree. Micros-typed
        // regenerations need no conversion.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
        else raw
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register temp views for SQL-surface queries (≈ filesql's
    * "file → table" contract, SURVEY §1.1: one file = one named relation). */
  def register(spark: SparkSession, dir: String, names: Seq[String] = all): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
