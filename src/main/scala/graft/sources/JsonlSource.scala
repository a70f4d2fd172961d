package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL (newline-delimited JSON) source — a SUPERSET of the reference's
  * format matrix (filesql reads CSV/TSV/LTSV/XLSX/Parquet only,
  * `file.go:452-493`): JSONL is the lingua franca of LLM training
  * corpora, so the engine ingests it as a first-class format.
  *
  * Spark-first: `spark.read.json` is a distributed, SPLITTABLE line scan
  * (each executor parses its own byte range) with native schema
  * inference — numbers → BIGINT/DOUBLE, booleans, nested structs/arrays
  * all come back typed, which is strictly more than the string-cast
  * pipeline the text formats need. Temporal values are ISO-8601 strings
  * on both write and read (cast back as needed — same text-format parity
  * trade as CSV). Compressed variants (.gz/.bz2/.xz/.zst) ride the same
  * codec shim as CSV (S6, [[Compression.sparkReadablePath]]).
  *
  * Note: like LTSV, columns come back NAME-SORTED (Spark's JSON schema
  * inference orders fields alphabetically).
  */
object JsonlSource {

  /** @param lenient false (default) = FAILFAST: a malformed line kills
    *   the read with a parse error, the reference's validate-loudly
    *   stance. true = PERMISSIVE: malformed lines yield a row whose
    *   `_corrupt_record` column holds the raw line — filterable, for raw
    *   crawled corpora where bad lines are expected. */
  def read(spark: SparkSession, path: String, lenient: Boolean = false): DataFrame = {
    val readable = Compression.sparkReadablePath(path)
    val r = spark.read.option("multiLine", "false")
      // accept Jackson's unquoted NaN/Infinity tokens as doubles — the
      // sink writes them unquoted so non-finite values round-trip TYPED
      // (quoted "NaN" would degrade the inferred column to string)
      .option("allowNonNumericNumbers", "true")
    val withMode =
      if (lenient) r.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
      else r.option("mode", "FAILFAST")
    withMode.json(readable)
  }
}
