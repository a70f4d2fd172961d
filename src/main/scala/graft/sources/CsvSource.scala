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
      multiLine: Boolean = false): DataFrame =
    read(spark, path, ",", inferTypes, multiLine)

  def readTsv(spark: SparkSession, path: String, inferTypes: Boolean = true,
      multiLine: Boolean = false): DataFrame =
    read(spark, path, "\t", inferTypes, multiLine)

  def read(spark: SparkSession, path: String, delimiter: String,
      inferTypes: Boolean, multiLine: Boolean): DataFrame = {
    val readable = Compression.sparkReadablePath(path)
    val header = readHeader(path, delimiter.charAt(0))
    checkDuplicateColumns(TableNaming.fromPath(path), header)
    val raw = spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("quote", "\"")
      .option("escape", "\"") // RFC-4180 doubled quotes
      .option("multiLine", multiLine.toString)
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
