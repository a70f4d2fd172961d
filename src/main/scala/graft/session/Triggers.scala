package graft.session

import graft.InvalidSqlError
import graft.mutate.Mutations

/** SQLite `CREATE TRIGGER` surface (reference `README.md:333` — "Triggers
  * and views" are promised via the embedded SQLite engine; lang syntax at
  * sqlite.org/lang_createtrigger.html).
  *
  * SQLite triggers are row-level: the body fires once per affected row
  * with `NEW`/`OLD` bound to that row. The Spark-native execution model
  * (see [[graft.session.GraftSession]]'s firing logic) is:
  *
  *   - the affected-row set of the outer DML statement is computed as ONE
  *     DataFrame with `NEW`/`OLD` struct columns (no driver materialization),
  *   - bodies made only of `INSERT … VALUES` tuples and canonical
  *     validation statements (`SELECT RAISE(…) WHERE cond`) are executed
  *     SET-BASED — `INSERT INTO t VALUES (NEW.a, …)` becomes
  *     `INSERT INTO t SELECT NEW.a, … FROM <affected>`, exactly one
  *     inserted row per affected row, which scales to any mutation size,
  *   - any other body falls back to faithful per-row firing (driver loop,
  *     bounded by `spark.graft.trigger.maxRows`) with `NEW.x`/`OLD.x`
  *     substituted as typed literals.
  *
  * Both paths match SQLite's end state; the set-based path may interleave
  * multi-statement bodies differently across rows (SQLite itself leaves
  * the row visit order unspecified).
  */
final case class TriggerDef(
    name: String,
    timing: String, // BEFORE | AFTER (SQLite default: BEFORE)
    event: String, // INSERT | UPDATE | DELETE
    updateOf: Seq[String], // UPDATE OF columns; empty = any column
    table: String,
    when: Option[String],
    body: Seq[String],
    createSql: String) {
  /** Set-based body compilation, memoized per definition so firing
    * doesn't re-parse the body on every DML statement. */
  lazy val vectorized: Option[Seq[Triggers.VecStmt]] = Triggers.vectorize(body)
}

object Triggers {

  private val HeaderRe =
    ("""(?is)^\s*CREATE\s+(?:TEMP(?:ORARY)?\s+)?TRIGGER\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """("[^"]+"|[A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """(?:(BEFORE|AFTER|INSTEAD\s+OF)\s+)?""" +
      """(DELETE|INSERT|UPDATE)(?:\s+OF\s+([^\s].*?))?\s+ON\s+""" +
      """("[^"]+"|[A-Za-z_][A-Za-z0-9_]*)\s*""" +
      """(?:FOR\s+EACH\s+ROW\s*)?(?:WHEN\s+(.+?))?\s*$""").r

  private def unquote(ident: String): String = Mutations.unquote(ident)

  /** Parse a full `CREATE TRIGGER … BEGIN stmts END` statement.
    * Returns (def, ifNotExists). */
  def parse(statement: String): (TriggerDef, Boolean) = {
    val trimmed = statement.trim.stripSuffix(";").trim
    // the body is everything between the FIRST top-level BEGIN and the
    // final END — found quote-aware so a WHEN string literal containing
    // "begin" can't split the statement early
    val beginIdx = Mutations.indexOfTopLevelWord(trimmed, "BEGIN")
    if (beginIdx < 0)
      throw InvalidSqlError(firstLine(statement), "CREATE TRIGGER requires a BEGIN … END body")
    val header = trimmed.substring(0, beginIdx)
    val afterBegin = trimmed.substring(beginIdx + "BEGIN".length)
    val endIdx = lastTopLevelWord(afterBegin, "END")
    if (endIdx < 0)
      throw InvalidSqlError(firstLine(statement), "CREATE TRIGGER body missing END")
    if (afterBegin.substring(endIdx + "END".length).trim.nonEmpty)
      throw InvalidSqlError(firstLine(statement), "trailing tokens after trigger END")
    val bodyText = afterBegin.substring(0, endIdx)
    val stmts = Mutations.splitTopLevel(bodyText, ';').map(_.trim).filter(_.nonEmpty)
    if (stmts.isEmpty)
      throw InvalidSqlError(firstLine(statement), "trigger body has no statements")
    header match {
      case HeaderRe(ifne, nameI, timingRaw, eventRaw, ofCols, tableI, whenExpr) =>
        val timing = Option(timingRaw).map(_.toUpperCase.replaceAll("\\s+", " ")).getOrElse("BEFORE")
        val event = eventRaw.toUpperCase
        val of = Option(ofCols).toSeq
          .flatMap(_.split(",").toSeq).map(c => unquote(c.trim)).filter(_.nonEmpty)
        if (of.nonEmpty && event != "UPDATE")
          throw InvalidSqlError(firstLine(statement), "OF column list is only valid on UPDATE triggers")
        (TriggerDef(unquote(nameI), timing, event, of, unquote(tableI),
          Option(whenExpr).map(_.trim).filter(_.nonEmpty), stmts,
          trimmed), ifne != null)
      case _ =>
        throw InvalidSqlError(firstLine(statement), "malformed CREATE TRIGGER header")
    }
  }

  private def firstLine(s: String): String = s.linesIterator.next()

  /** Re-point a trigger definition at a renamed column of its subject
    * table (SQLite ≥ 3.25 semantics): the `UPDATE OF` list and every
    * `NEW.col`/`OLD.col` qualified reference (WHEN clause, body
    * statements, stored CREATE SQL) are rewritten, so the trigger keeps
    * firing and its bindings keep resolving. Unqualified references to
    * the column inside body statements keep their original text — the
    * same documented deviation class as RENAME TABLE's body references
    * (a body targeting ANOTHER table may legitimately use the same
    * column name). Text inside single-quoted string LITERALS is never
    * rewritten (the scan is quote-aware, `''` escapes included); a
    * double-quoted OF-list identifier whose name contains the token
    * " on " falls in the same deviation class (the OF…ON span match is
    * textual). */
  def renameColumn(td: TriggerDef, from: String, to: String): TriggerDef = {
    val qf = java.util.regex.Pattern.quote(from)
    // bare, "quoted", `backtick` and [bracket] qualified references all
    // re-point — the scanners treat the latter two as atomic spans, so
    // the rename must understand them too or the trigger would keep
    // firing against the dropped column name
    val fixRe = ("(?is)^(NEW|OLD)\\s*\\.\\s*(?:" + qf + "\\b|\"" + qf +
      "\"|`" + qf + "`|\\[" + qf + "\\])").r
    def fixRefs(s: String): String = rewriteTopLevel(s) { rest =>
      fixRe.findPrefixMatchOf(rest).map(mm => (mm.group(1) + "." + to, mm.end))
    }
    // the OF list in the stored CREATE SQL: rename matching idents
    // between the first top-level OF and ON (UPDATE OF triggers only)
    def fixOfList(sql: String): String =
      if (td.updateOf.isEmpty) sql
      else "(?is)(\\bOF\\s+)(.*?)(\\s+ON\\b)".r.findFirstMatchIn(sql) match {
        case Some(m) =>
          val cols = m.group(2).split(",").map { c =>
            val t = c.trim
            if (unquote(t).equalsIgnoreCase(from)) to else t
          }.mkString(", ")
          sql.substring(0, m.start) + m.group(1) + cols + m.group(3) + sql.substring(m.end)
        case None => sql
      }
    td.copy(
      updateOf = td.updateOf.map(c => if (c.equalsIgnoreCase(from)) to else c),
      when = td.when.map(fixRefs),
      body = td.body.map(fixRefs),
      createSql = fixOfList(fixRefs(td.createSql)))
  }

  /** Last top-level (quote/paren-aware — single-quoted literals AND
    * double-quoted identifiers) occurrence of a word. */
  private def lastTopLevelWord(s: String, word: String): Int = {
    var depth = 0; var inStr = false; var inDq = false
    var inBt = false; var inBr = false; var i = 0; var last = -1
    val n = s.length; val w = word.length
    while (i < n) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inDq) { if (c == '"') inDq = false }
      else if (inBt) { if (c == '`') inBt = false }
      else if (inBr) { if (c == ']') inBr = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inDq = true
        case '`' => inBt = true
        case '[' => inBr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && i + w <= n &&
            s.regionMatches(true, i, word, 0, w) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) &&
            (i + w == n || !isWordChar(s.charAt(i + w))))
            last = i
      }
      i += 1
    }
    last
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  // ------------------------------------------------- body classification

  /** A body statement in set-based executable form. */
  sealed trait VecStmt
  /** `INSERT INTO table [cols] SELECT exprs FROM <affected>` — one tuple
    * of the original VALUES list (multi-tuple inserts expand to one
    * VecInsert per tuple, preserving tuple order). */
  final case class VecInsert(table: String, columns: Option[Seq[String]],
      selectExprs: Seq[String]) extends VecStmt
  /** `SELECT RAISE(kind,'msg') WHERE cond` — abort the outer statement if
    * ANY affected row satisfies cond. */
  final case class VecRaise(kind: String, message: String, cond: Option[String]) extends VecStmt

  private val InsertValuesRe =
    """(?is)^\s*INSERT\s+INTO\s+("[^"]+"|[A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*VALUES\s*(.+?)\s*$""".r
  // the canonical SQLite validation-trigger shape; no FROM clause, so the
  // WHERE may only reference NEW/OLD — exactly what the affected set holds
  private val SelectRaiseRe =
    """(?is)^\s*SELECT\s+RAISE\s*\(\s*(ABORT|FAIL|ROLLBACK)\s*,\s*'((?:[^']|'')*)'\s*\)\s*(?:WHERE\s+(.+?))?\s*$""".r
  private val RaiseIgnoreRe = """(?is).*\bRAISE\s*\(\s*IGNORE\s*\).*""".r

  /** Recognize the canonical validation statement for per-row firing
    * (post-substitution its WHERE is row-free). */
  def asSelectRaise(stmt: String): Option[VecRaise] = stmt match {
    case SelectRaiseRe(kind, msg, cond) =>
      Some(VecRaise(kind.toUpperCase, msg.replace("''", "'"), Option(cond).map(_.trim)))
    case _ => None
  }

  def hasRaiseIgnore(stmt: String): Boolean =
    RaiseIgnoreRe.pattern.matcher(stmt).matches()

  private val RaiseCallRe =
    """(?is)^RAISE\s*\(\s*(?:ABORT|FAIL|ROLLBACK)\s*,\s*('(?:[^']|'')*')\s*\)""".r

  /** Rewrite SQLite `RAISE(kind, 'msg')` calls to Spark's
    * `raise_error('msg')` so non-canonical shapes (RAISE inside a CASE)
    * actually execute on the per-row path. Kind distinctions collapse
    * to ABORT here — only the canonical `SELECT RAISE(…) WHERE …`
    * statement shape preserves ROLLBACK semantics. Quote-aware:
    * occurrences inside string literals are left alone. */
  def rewriteRaise(stmt: String): String = rewriteTopLevel(stmt) { rest =>
    RaiseCallRe.findPrefixMatchOf(rest)
      .map(mm => (s"raise_error(${mm.group(1)})", mm.end))
  }

  /** The ONE quote-aware rewrite engine every textual body transform
    * rides (RAISE rewriting, per-row NEW/OLD substitution, renameColumn
    * fix-ups — previously three hand-rolled scanners with drifting
    * quote policies): scan `stmt` left to right, attempt `matcher`
    * against the remaining suffix at each word boundary OUTSIDE
    * single-quoted literals, and pass everything else through verbatim.
    * Double-quoted, backtick and [bracket] identifiers pass through
    * un-matched as atomic spans
    * (an apostrophe inside `"aud'it"` must not open a literal), but a
    * match may itself CONSUME a quoted identifier (NEW."col") because
    * matching is attempted before the quote is consumed. `matcher`
    * returns (replacement, charsConsumed); replacements are emitted
    * verbatim, never rescanned. */
  private def rewriteTopLevel(stmt: String)(
      matcher: String => Option[(String, Int)]): String = {
    val sb = new StringBuilder
    var inSq = false; var inDq = false
    var inBt = false; var inBr = false
    var i = 0
    val n = stmt.length
    while (i < n) {
      val c = stmt.charAt(i)
      if (inSq) {
        sb += c
        if (c == '\'') inSq = false
        i += 1
      } else if (inDq) {
        sb += c
        if (c == '"') inDq = false
        i += 1
      } else if (inBt) {
        sb += c
        if (c == '`') inBt = false
        i += 1
      } else if (inBr) {
        sb += c
        if (c == ']') inBr = false
        i += 1
      } else {
        val prevOk = i == 0 || !isWordChar(stmt.charAt(i - 1))
        val m = if (prevOk) matcher(stmt.substring(i)) else None
        m match {
          case Some((replacement, consumed)) =>
            sb ++= replacement
            i += consumed
          case None =>
            if (c == '\'') inSq = true
            else if (c == '"') inDq = true
            else if (c == '`') inBt = true
            else if (c == '[') inBr = true
            sb += c; i += 1
        }
      }
    }
    sb.result()
  }

  /** Try to compile every body statement to a set-based form; None ⇒ the
    * body needs faithful per-row firing. */
  def vectorize(body: Seq[String]): Option[Seq[VecStmt]] = {
    val out = Seq.newBuilder[VecStmt]
    for (stmt <- body) stmt match {
      case RaiseIgnoreRe() => return None // per-row path rejects it with a typed error
      case SelectRaiseRe(kind, msg, cond) =>
        out += VecRaise(kind.toUpperCase, msg.replace("''", "'"),
          Option(cond).map(c => normalizeRowRefs(c.trim)))
      case InsertValuesRe(tableI, _, cols, values) =>
        // unquote here: fireVectorized re-quotes each name, so a quoted
        // source column would otherwise end up doubly quoted
        val columns = Option(cols).map(
          _.split(",").map(c => unquote(c.trim)).filter(_.nonEmpty).toSeq)
        val tuples = Mutations.splitTopLevel(values, ',').map(_.trim)
        for (t <- tuples) {
          if (!t.startsWith("(") || !t.endsWith(")")) return None
          val exprs = Mutations.splitTopLevel(t.substring(1, t.length - 1), ',')
            .map(e => normalizeRowRefs(e.trim))
          out += VecInsert(unquote(tableI), columns, exprs)
        }
      case _ => return None
    }
    Some(out.result())
  }

  /** Normalize QUOTED `NEW.x`/`OLD.x` references to Spark-native
    * backtick form for vectorized execution, where the text reaches
    * Spark's parser verbatim (the per-row path renders literals via
    * [[substituteRowRefs]] and needs no normalization): `NEW."x"`,
    * `NEW.[x]` and `NEW.`x`` all become `NEW.`x``; bare references
    * pass through untouched. */
  private def normalizeRowRefs(s: String): String = rewriteTopLevel(s) { rest =>
    RefRe.findPrefixMatchOf(rest).collect {
      case mm if { val h = mm.group(2).head; h == '"' || h == '`' || h == '[' } =>
        (mm.group(1).toUpperCase + ".`" +
          unquote(mm.group(2)).replace("`", "``") + "`", mm.end)
    }
  }

  /** Substitute `NEW.col` / `OLD.col` references with rendered literals
    * for per-row firing. Quote-aware: references inside string literals
    * are left alone. */
  // all four dialect identifier forms: bare, "quoted", `backtick`,
  // [bracket] — the scanners accept the latter two as atomic spans, so
  // the fire-time substituter must resolve them too (a NEW.`role` left
  // as raw text would fail analysis: no NEW relation exists per-row)
  private val RefRe =
    """(?is)^(NEW|OLD)\s*\.\s*("[^"]+"|`[^`]+`|\[[^\]]+\]|[A-Za-z_][A-Za-z0-9_]*)""".r

  def substituteRowRefs(stmt: String, render: (String, String) => String): String =
    rewriteTopLevel(stmt) { rest =>
      RefRe.findPrefixMatchOf(rest)
        .map(mm => (render(mm.group(1).toUpperCase, unquote(mm.group(2))), mm.end))
    }

  /** Render one row value as a SQL literal for per-row substitution. */
  def renderLiteral(v: Any, dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    if (v == null) s"CAST(NULL AS ${dt.sql})"
    else dt match {
      case StringType => "'" + v.toString.replace("'", "''") + "'"
      case LongType | IntegerType | ShortType | ByteType => v.toString
      case BooleanType => v.toString
      case DoubleType | FloatType =>
        val d = v.toString
        // a bare literal like 1.5 would parse as DECIMAL in SQL — force
        // the double type so arithmetic downstream keeps double semantics
        s"CAST('$d' AS DOUBLE)"
      case _: DecimalType => v.toString
      case TimestampType =>
        // java.sql.Timestamp.toString renders in the JVM-default zone,
        // but the literal re-parses under the session's pinned UTC —
        // format the instant in UTC explicitly so non-UTC JVMs don't
        // shift the value
        val utc = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
          .withZone(java.time.ZoneOffset.UTC)
          .format(v.asInstanceOf[java.sql.Timestamp].toInstant)
        s"TIMESTAMP '$utc'"
      case DateType => s"DATE '${v.toString}'"
      case BinaryType =>
        val hex = v.asInstanceOf[Array[Byte]].map(b => f"$b%02X").mkString
        s"X'$hex'"
      case other =>
        throw InvalidSqlError(s"trigger row value of type ${other.simpleString}",
          "per-row trigger firing supports atomic column types only — " +
            "use an INSERT … VALUES body (set-based path) for complex columns")
    }
  }
}
