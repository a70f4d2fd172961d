package graft.sinks

import java.io.{OutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.{Compression, XlsxSource}

/** Export options ≈ the reference's fluent `DumpOptions` (format ×
  * compression, `save.go:139-197`). Parquet uses its internal codec;
  * external compression of parquet is rejected like the reference
  * (`filesql.go:716-719`). */
final case class DumpOptions(
    format: String = "csv", // csv | tsv | ltsv | parquet | xlsx | jsonl | orc
    compression: Option[Compression.Codec] = None,
    /** parity mode: write parquet columns as strings like the reference
      * (`filesql.go:709-821` writes all-UTF8); off = native typed (superset) */
    parquetAllString: Boolean = false) {
  require(!(Seq("parquet", "orc").contains(format) && compression.nonEmpty),
    s"$format with external compression is not supported (use the format's internal codec)")
  def extension: String = s".$format${compression.map(_.ext).getOrElse("")}"
}

/** Sinks (reference S11–S16, `filesql.go:161-962`).
  *
  * Two shapes:
  *   - [[Dump.writeTable]] — reference parity: ONE file per table
  *     (`{table}.{ext}`), streamed through `toLocalIterator` (bounded
  *     driver memory: one partition at a time), optionally compressed.
  *     Single-file output is inherently single-writer — same as the
  *     reference and as `coalesce(1)`.
  *   - [[Dump.writeDistributed]] — the 100 TB path: `df.write` to a
  *     directory with full parallelism (all executors write), any codec.
  */
object Dump {

  /** Dump every column as text the way the reference exports: NULL → ""
    * (`filesql.go:370-375`), everything else via its string form. */
  private def renderRows(df: DataFrame): (Seq[String], Iterator[Seq[String]]) = {
    val cols = df.columns.toSeq
    val it = df.toLocalIterator()
    val rows = new Iterator[Seq[String]] {
      def hasNext: Boolean = it.hasNext
      def next(): Seq[String] = {
        val r = it.next()
        cols.indices.map { i =>
          if (r.isNullAt(i)) ""
          else r.get(i) match {
            // BLOB columns: valid-UTF-8 payloads render as their text (the
            // reference's Go layer writes []byte raw; for UTF-8 data the
            // bytes are identical). Arbitrary binary can't pass through a
            // text sink losslessly — UTF-8 decoding would smash non-UTF-8
            // bytes to U+FFFD — so those render as SQLite's X'hex' literal
            // form: a faithful, deterministic EXPORT rendering, though
            // one-way (re-reading a CSV yields the literal text; binary
            // round trips need the typed parquet format). String.valueOf
            // would print the JVM array identity ([B@…) — garbage and
            // run-dependent.
            case b: Array[Byte] => renderBlob(b)
            case v => String.valueOf(v)
          }
        }
      }
    }
    (cols, rows)
  }

  private def renderBlob(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        b.map(x => f"${x & 0xff}%02X").mkString("X'", "", "'")
    }
  }

  def writeTable(df: DataFrame, table: String, dir: String, opts: DumpOptions = DumpOptions()): Unit = {
    Files.createDirectories(Paths.get(dir))
    val target = Paths.get(dir, s"$table${opts.extension}")
    // write to a sibling temp file, then atomically replace: auto-save's
    // "overwrite originals" mode exports a LAZY plan that still reads the
    // original file — truncating it in place while streaming from it
    // would corrupt the export
    // tmp name is unique per call (no concurrent-dump races) and keeps
    // the full extension chain at the END (codec detection is
    // extension-keyed); partial files are removed on failure
    val tmp = target.resolveSibling(
      s".graft-tmp-${java.util.UUID.randomUUID().toString.take(8)}.${target.getFileName}")
    try {
      opts.format match {
        case "csv" => writeDelimited(df, tmp, ',')
        case "tsv" => writeDelimited(df, tmp, '\t')
        case "ltsv" => writeLtsv(df, tmp)
        case "jsonl" => writeJsonl(df, tmp)
        case "xlsx" => writeXlsx(df, table, tmp)
        case "parquet" => writeSingleParquet(df, tmp, opts.parquetAllString)
        case "orc" => writeSingleColumnar(df, tmp, "orc")
        case other => throw graft.UnsupportedFormatError(other)
      }
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  /** Dump-all (S16): every table in the session catalog. */
  def dumpAll(tables: Seq[(String, DataFrame)], dir: String, opts: DumpOptions = DumpOptions()): Unit =
    tables.foreach { case (name, df) => writeTable(df, name, dir, opts) }

  // ------------------------------------------------------------- delimited

  private def csvField(v: String, delim: Char): String =
    if (v.exists(c => c == delim || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  private def writeDelimited(df: DataFrame, target: Path, delim: Char): Unit = {
    val (cols, rows) = renderRows(df)
    withWriter(target) { w =>
      w.write(cols.map(csvField(_, delim)).mkString(delim.toString)); w.write("\n")
      rows.foreach { r =>
        w.write(r.map(csvField(_, delim)).mkString(delim.toString)); w.write("\n")
      }
    }
  }

  // ------------------------------------------------------------------ ltsv

  private def writeLtsv(df: DataFrame, target: Path): Unit = {
    val (cols, rows) = renderRows(df)
    withWriter(target) { w =>
      rows.foreach { r =>
        w.write(cols.zip(r).map { case (c, v) => s"$c:$v" }.mkString("\t")); w.write("\n")
      }
    }
  }

  // ----------------------------------------------------------------- jsonl

  /** One JSON object per row, TYPED values (numbers stay numbers,
    * booleans stay booleans) so [[graft.sources.JsonlSource]] reads the
    * file back with its native types — unlike the all-string text sinks.
    * NULL fields are omitted (Spark's own JSON writer convention; absent
    * and null are indistinguishable to every JSON reader) — EXCEPT
    * columns that are null in every row, which emit explicit nulls so
    * the read-back does not silently lose the column (its type reads
    * back as string; inference cannot type a value it never sees). Temporal
    * values render as ISO-8601 text (timestamps as UTC instants), binary
    * as base64, nested arrays/maps/structs recursively.
    *
    * Deliberately NOT df.toJSON: Spark's generator quotes non-finite
    * doubles ("NaN"), which flips the inferred column to string on
    * read-back — this encoder emits Jackson's unquoted NaN/Infinity
    * tokens so the typed round trip survives. Consequence: the
    * distributed path ([[writeDistributed]]("jsonl"), Spark's writer)
    * differs on exactly two points — quoted non-finite doubles, and
    * session-timezone timestamp rendering (identical under the
    * sessions' UTC pin). */
  private def writeJsonl(df: DataFrame, target: Path): Unit = {
    val cols = df.columns.toSeq
    // a column that is NULL in EVERY row would otherwise never appear in
    // the file, and the read-back would silently lose it — for those
    // columns emit an explicit null per row so the column survives (as a
    // string-typed null column: inference cannot recover the type of a
    // value it never sees, but presence beats silent disappearance). One
    // cheap aggregate job; the per-row null-omission convention for
    // mixed columns is unchanged.
    // the detection pass re-runs the upstream plan once, so skip it
    // when the schema proves no column can be all-null
    val allNull: Set[Int] =
      if (df.schema.forall(!_.nullable)) Set.empty
      else {
        val nonNullCounts = df.select(cols.map(c =>
          count(col(s"`$c`")).as(c)): _*).head()
        cols.indices.filter(i => nonNullCounts.getLong(i) == 0L).toSet
      }
    val it = df.toLocalIterator()
    withWriter(target) { w =>
      while (it.hasNext) {
        val r = it.next()
        val sb = new StringBuilder("{")
        var first = true
        cols.indices.foreach { i =>
          if (!r.isNullAt(i) || allNull(i)) {
            if (!first) sb += ','
            first = false
            sb ++= jsonString(cols(i)); sb += ':'
            if (r.isNullAt(i)) sb ++= "null" else jsonValue(r.get(i), sb)
          }
        }
        sb += '}'
        w.write(sb.result()); w.write("\n")
      }
    }
  }

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').result()
  }

  private def jsonValue(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb ++= "null"
    case b: Boolean => sb ++= b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => sb ++= n.toString
    // non-finite doubles render as Jackson's unquoted NaN / Infinity /
    // -Infinity tokens (exactly Double.toString), which the reader maps
    // back to typed doubles (allowNonNumericNumbers). Spark's own JSON
    // writer quotes them ("NaN") — schema inference then degrades the
    // whole column to string on read-back; this encoder exists precisely
    // to keep the round trip typed (see writeJsonl's doc).
    case d: Double => sb ++= d.toString
    case f: Float => sb ++= f.toString
    case d: java.math.BigDecimal => sb ++= d.toPlainString
    case d: BigDecimal => sb ++= d.bigDecimal.toPlainString
    case s: String => sb ++= jsonString(s)
    case b: Array[Byte] => sb ++= jsonString(java.util.Base64.getEncoder.encodeToString(b))
    case t: java.sql.Timestamp => sb ++= jsonString(t.toInstant.toString)
    case t: java.time.Instant => sb ++= jsonString(t.toString)
    case d: java.sql.Date => sb ++= jsonString(d.toString)
    case d: java.time.LocalDate => sb ++= jsonString(d.toString)
    case xs: scala.collection.Seq[_] =>
      sb += '['
      var first = true
      xs.foreach { x =>
        if (!first) sb += ','
        first = false
        jsonValue(x, sb)
      }
      sb += ']'
    case m: scala.collection.Map[_, _] =>
      sb += '{'
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb += ','
        first = false
        sb ++= jsonString(String.valueOf(k)); sb += ':'; jsonValue(x, sb)
      }
      sb += '}'
    case r: Row =>
      sb += '{'
      var first = true
      r.schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
        if (!r.isNullAt(i)) {
          if (!first) sb += ','
          first = false
          sb ++= jsonString(name); sb += ':'; jsonValue(r.get(i), sb)
        }
      }
      sb += '}'
    case other => sb ++= jsonString(String.valueOf(other))
  }

  // ------------------------------------------------------------------ xlsx

  private def writeXlsx(df: DataFrame, table: String, target: Path): Unit = {
    val (cols, rows) = renderRows(df)
    val out = Compression.openWrite(target.toString)
    try XlsxSource.write(out, table, cols, rows) finally out.close()
  }

  // --------------------------------------------------------------- parquet

  private def writeSingleParquet(df: DataFrame, target: Path, allString: Boolean): Unit = {
    val toWrite =
      if (allString) df.select(df.columns.map(c => col(s"`$c`").cast("string").as(c)).toSeq: _*)
      else df
    writeSingleColumnar(toWrite, target, "parquet")
  }

  /** Single-file columnar write (parquet/orc): coalesce(1) into a temp
    * dir, then promote the lone part file to the target name. */
  private def writeSingleColumnar(df: DataFrame, target: Path, format: String): Unit = {
    val tmp = Files.createTempDirectory("graft-dump-")
    try {
      val tmpOut = tmp.resolve("out")
      df.coalesce(1).write.mode("overwrite").format(format).save(tmpOut.toString)
      val listing = Files.list(tmpOut)
      val moved =
        try {
          val it = listing.iterator()
          var done = false
          while (it.hasNext && !done) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(s".$format")) {
              Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
              done = true
            }
          }
          done
        } finally listing.close()
      if (!moved) throw new IllegalStateException(s"no $format part produced for $target")
    } finally graft.Paths.rmTree(tmp.toFile) // _SUCCESS/.crc leftovers
  }

  // ------------------------------------------------------------ big-data path

  /** Distributed directory write — the shape to use at cluster scale:
    * all executors write in parallel, with partitioning/codec options
    * (e.g. `writeDistributed(df, "s3://…/t", "parquet")`). */
  def writeDistributed(df: DataFrame, dir: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil, options: Map[String, String] = Map.empty): Unit = {
    val w0 = df.write.mode("overwrite").options(options)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      case "csv" => w.option("header", "true").csv(dir)
      case "tsv" => w.option("header", "true").option("sep", "\t").csv(dir)
      case "jsonl" => w.json(dir)
      case "parquet" => w.parquet(dir)
      case "orc" => w.orc(dir)
      case other => throw graft.UnsupportedFormatError(other)
    }
  }

  private def withWriter(target: Path)(f: OutputStreamWriter => Unit): Unit = {
    val out: OutputStream = Compression.openWrite(target.toString)
    val w = new OutputStreamWriter(out, StandardCharsets.UTF_8)
    try f(w) finally w.close()
  }
}
