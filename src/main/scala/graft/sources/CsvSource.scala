package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.DuplicateColumnError

/** CSV / TSV sources (reference S1/S2: `file.go:452-493`, `stream.go:110-145`).
  *
  * Spark-first: the file is read distributed with Spark's CSV reader as
  * all-string columns (no built-in inferSchema — the reference's inference
  * semantics differ, SURVEY §1.3), then typed via [[TypeInference]] casts,
  * which are plain Catalyst expressions (whole-stage codegen, no UDFs).
  *
  * Scale: header/duplicate checks and type inference read only the file
  * head; the bulk load is a distributed scan. gz/bz2 decode inside Spark;
  * xz/zst via the one-time shim in [[Compression]].
  */
object CsvSource {

  def readCsv(spark: SparkSession, path: String, inferTypes: Boolean = true,
      multiLine: Option[Boolean] = None): DataFrame =
    read(spark, path, ",", inferTypes, multiLine)

  def readTsv(spark: SparkSession, path: String, inferTypes: Boolean = true,
      multiLine: Option[Boolean] = None): DataFrame =
    read(spark, path, "\t", inferTypes, multiLine)

  /** Does any quoted field span a physical line? Exact for RFC-4180: a
    * line whose '"' count is odd leaves a quote open at the newline
    * (wrapping quotes pair up within a line, doubled quotes are even).
    * One distributed scan with `head(1)` short-circuit; a quote inside an
    * unquoted field can false-positive, which only costs splittability,
    * never correctness. */
  def detectQuotedNewlines(spark: SparkSession, readable: String): Boolean = {
    import org.apache.spark.sql.functions._
    spark.read.text(readable)
      .filter(((length(col("value")) -
        length(translate(col("value"), "\"", ""))) % 2) === 1)
      .head(1).nonEmpty
  }

  /** @param multiLine None = auto-detect via [[detectQuotedNewlines]].
    *   Files with embedded newlines inside quoted fields (which
    *   [[graft.sinks.Dump]] legitimately writes) need multiLine parsing or
    *   they silently split into corrupt rows; files without them stay on
    *   the line-splittable fast path. Pass Some(false) to skip the
    *   detection scan when the data is known newline-free. */
  def read(spark: SparkSession, path: String, delimiter: String,
      inferTypes: Boolean, multiLine: Option[Boolean]): DataFrame = {
    val readable = Compression.sparkReadablePath(path)
    val header = readHeader(path, delimiter.charAt(0))
    checkDuplicateColumns(TableNaming.fromPath(path), header)
    val ml = multiLine.getOrElse(detectQuotedNewlines(spark, readable))
    val raw = spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("quote", "\"")
      .option("escape", "\"") // RFC-4180 doubled quotes
      .option("multiLine", ml.toString)
      .option("inferSchema", "false")
      .csv(readable)
    // reference model: every cell is a string; absent/empty cells are ""
    // until typed casts turn non-parseable (incl. empty) cells into NULL
    val allString = raw.na.fill("")
    if (inferTypes) TypeInference.applyTypes(allString, TypeInference.inferForDataFrame(allString))
    else allString
  }

  /** Duplicate column names (case-sensitive, after trim) are an error —
    * `types.go:202-214`, `doc.go:78-84`. */
  def checkDuplicateColumns(table: String, header: Seq[String]): Unit = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    header.map(_.trim).foreach { c =>
      if (!seen.add(c)) throw DuplicateColumnError(table, c)
    }
  }

  /** Parse the first record of the file (driver-side, streaming — reads
    * only the header bytes) as RFC-4180: quoted fields may contain the
    * delimiter, doubled quotes, and newlines. */
  def readHeader(path: String, delim: Char): Seq[String] = {
    val in = Compression.openRead(path)
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    try {
      val fields = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inQuotes = false
      var done = false
      var ci = r.read()
      // strip UTF-8 BOM
      if (ci == 0xFEFF) ci = r.read()
      while (!done && ci >= 0) {
        val c = ci.toChar
        if (inQuotes) {
          if (c == '"') {
            val next = r.read()
            if (next == '"') { cur += '"'; ci = r.read() }
            else { inQuotes = false; ci = next }
          } else { cur += c; ci = r.read() }
        } else c match {
          case '"' => inQuotes = true; ci = r.read()
          case `delim` => fields += cur.result(); cur.clear(); ci = r.read()
          case '\r' => ci = r.read() // swallow; \n terminates
          case '\n' => done = true
          case other => cur += other; ci = r.read()
        }
      }
      fields += cur.result()
      fields.toSeq
    } finally r.close()
  }
}
