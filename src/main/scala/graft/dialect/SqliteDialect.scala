package graft.dialect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, TimestampType}

import graft.InvalidSqlError

/** SQLite-dialect compatibility functions (SURVEY §2.2 ⚠ shim list).
  *
  * Registered as native Catalyst expression builders — each call site
  * expands into built-in expressions (`date_format`, arithmetic,
  * `get_json_object`, …), so they participate in constant folding and
  * whole-stage codegen exactly like built-ins. No UDF boundary, no
  * serialization penalty — this matters at 100 TB where a Scala UDF on a
  * hot column would break codegen for the whole stage.
  *
  * Shims: `strftime`, `julianday`, `date`, `datetime`, `time`, `ifnull`,
  * `printf`, `group_concat`, `json_extract`, `glob`, `total`, `quote`,
  * `char` (variadic), `unicode`, `zeroblob`, `typeof` (SQLite
  * storage-class names).
  * (`instr`, `substr`, `round`, `abs`, … already match SQLite semantics
  * natively in Spark SQL — SURVEY §2.2.)
  */
object SqliteDialect {

  /** SQLite strftime '%x' directives → Spark datetime pattern letters. */
  private val strftimeMap: Seq[(String, String)] = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss",
    "%j" -> "DDD", "%e" -> "d", "%I" -> "hh", "%p" -> "a",
    "%f" -> "ss.SSS", "%%" -> "%")

  def translateStrftime(fmt: String): String = {
    // escape Spark pattern letters that appear literally, then substitute
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val directive = fmt.substring(i, i + 2)
        strftimeMap.find(_._1 == directive) match {
          case Some((_, spark)) => out.append(spark)
          case None => throw InvalidSqlError(fmt, s"unsupported strftime directive $directive")
        }
        i += 2
      } else {
        if (c.isLetter) { out.append('\''); out.append(c); out.append('\'') }
        else out.append(c)
        i += 1
      }
    }
    out.result()
  }

  private def info(name: String) = new ExpressionInfo(getClass.getName, name)

  /** Full strftime expression: pattern-mappable directives batch into
    * `date_format` segments; `%s` (unix seconds) and `%w` (weekday 0–6,
    * Sunday = 0) need arithmetic, so the result is a Concat of segments
    * — still pure built-in expressions, still codegen'd. */
  def strftimeExpr(fmt: String, ts: Expression): Expression = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Expression]
    val pat = new StringBuilder
    def flush(): Unit =
      if (pat.nonEmpty) { parts += DateFormatClass(ts, Literal(pat.result())); pat.clear() }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.substring(i, i + 2) match {
          case "%s" =>
            flush()
            parts += Cast(Cast(ts, org.apache.spark.sql.types.LongType), StringType)
          case "%w" =>
            flush()
            parts += Cast(Subtract(DayOfWeek(ts), Literal(1)), StringType)
          case d => strftimeMap.find(_._1 == d) match {
            case Some((_, spark)) => pat.append(spark)
            case None => throw InvalidSqlError(fmt, s"unsupported strftime directive $d")
          }
        }
        i += 2
      } else {
        if (c.isLetter) { pat.append('\''); pat.append(c); pat.append('\'') }
        else pat.append(c)
        i += 1
      }
    }
    flush()
    if (parts.length == 1) parts.head else Concat(parts.toSeq)
  }

  private def toTimestamp(e: Expression): Expression =
    if (e.dataType == TimestampType) e else Cast(e, TimestampType)

  /** (name, info, builder) triples — consumable both by direct session
    * registration ([[register]]) and by [[GraftSparkExtensions]] via
    * `spark.sql.extensions`. */
  def functionSpecs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def fmtFn(name: String, pattern: String): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
      (FunctionIdentifier(name), info(name), {
        case Seq(ts) => DateFormatClass(toTimestamp(ts), Literal(pattern))
        case _ => throw InvalidSqlError(name, "expects one argument")
      })
    Seq(
      // strftime(fmt, ts) — SQLite argument order (fmt first)
      (FunctionIdentifier("strftime"), info("strftime"), {
        case Seq(Literal(fmt, StringType), ts) =>
          strftimeExpr(fmt.toString, toTimestamp(ts))
        case _ => throw InvalidSqlError("strftime", "format must be a string literal")
      }: Seq[Expression] => Expression),
      // julianday(ts) = unix_seconds/86400 + 2440587.5
      (FunctionIdentifier("julianday"), info("julianday"), {
        case Seq(ts) =>
          Add(Divide(Cast(toTimestamp(ts), DoubleType), Literal(86400.0)), Literal(2440587.5))
        case _ => throw InvalidSqlError("julianday", "expects one argument")
      }: Seq[Expression] => Expression),
      // date/datetime/time → SQLite's canonical text forms
      fmtFn("date", "yyyy-MM-dd"),
      fmtFn("datetime", "yyyy-MM-dd HH:mm:ss"),
      fmtFn("time", "HH:mm:ss"),
      // ifnull(a, b) = coalesce
      (FunctionIdentifier("ifnull"), info("ifnull"), {
        case args if args.length == 2 => Coalesce(args)
        case _ => throw InvalidSqlError("ifnull", "expects two arguments")
      }: Seq[Expression] => Expression),
      // iif(cond, a, b) = if
      (FunctionIdentifier("iif"), info("iif"), {
        case Seq(c, a, b) => If(c, a, b)
        case _ => throw InvalidSqlError("iif", "expects three arguments")
      }: Seq[Expression] => Expression),
      // printf(fmt, …) = format_string
      (FunctionIdentifier("printf"), info("printf"),
        ((args: Seq[Expression]) => FormatString(args: _*))),
      // group_concat(x[, sep]) = concat_ws(sep, collect_list(x))
      // NOTE: aggregation order is unspecified, exactly as in SQLite.
      (FunctionIdentifier("group_concat"), info("group_concat"), {
        case Seq(x) =>
          ConcatWs(Seq(Literal(","), CollectList(Cast(x, StringType)).toAggregateExpression()))
        case Seq(x, Literal(sep, StringType)) =>
          ConcatWs(Seq(Literal(sep.toString), CollectList(Cast(x, StringType)).toAggregateExpression()))
        case _ => throw InvalidSqlError("group_concat", "expects (expr[, separator-literal])")
      }: Seq[Expression] => Expression),
      // json_extract(json, path) = get_json_object
      (FunctionIdentifier("json_extract"), info("json_extract"), {
        case Seq(j, p) => GetJsonObject(j, p)
        case _ => throw InvalidSqlError("json_extract", "expects (json, path)")
      }: Seq[Expression] => Expression),
      // glob(pattern, x) — SQLite GLOB as a function: * ? [...] wildcards
      // ('^' negates a class, '!' is literal — SQLite semantics),
      // case-sensitive; translated to an anchored regex (RLike)
      (FunctionIdentifier("glob"), info("glob"), {
        case Seq(Literal(null, _), _) => Literal(null, org.apache.spark.sql.types.BooleanType)
        case Seq(Literal(pat, StringType), x) =>
          RLike(x, Literal(globToRegex(pat.toString)))
        case _ => throw InvalidSqlError("glob", "expects (pattern-literal, expr)")
      }: Seq[Expression] => Expression),
      // total(x) — like SUM but 0.0 (never NULL) over empty/all-NULL input
      (FunctionIdentifier("total"), info("total"), {
        case Seq(x) =>
          Coalesce(Seq(
            aggregate.Sum(Cast(x, DoubleType)).toAggregateExpression(),
            Literal(0.0)))
        case _ => throw InvalidSqlError("total", "expects one argument")
      }: Seq[Expression] => Expression),
      // quote(x) — SQL-literal rendering: NULL → 'NULL', strings quoted
      // with '' doubling, blobs → X'hex', numbers as text. TypeOf is
      // foldable, so the CASE collapses to one branch at optimize time.
      (FunctionIdentifier("quote"), info("quote"), {
        case Seq(e) =>
          val s = Cast(e, StringType)
          CaseWhen(Seq(
            (IsNull(e), Literal("NULL")),
            (EqualTo(TypeOf(e), Literal("string")),
              Concat(Seq(Literal("'"),
                StringReplace(s, Literal("'"), Literal("''")), Literal("'")))),
            (EqualTo(TypeOf(e), Literal("binary")),
              Concat(Seq(Literal("X'"), Hex(e), Literal("'"))))),
            Some(s))
        case _ => throw InvalidSqlError("quote", "expects one argument")
      }: Seq[Expression] => Expression),
      // char(c1, c2, …) — string from UNICODE codepoints via a static
      // kernel: Spark's Chr is chr(n % 256) and diverges above U+00FF
      (FunctionIdentifier("char"), info("char"), {
        case args if args.nonEmpty =>
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            graft.functions.SqliteKernelsImpl.getClass, StringType, "charFromCodepoints",
            Seq(CreateArray(args.map(Cast(_, LongType)))),
            Seq(org.apache.spark.sql.types.ArrayType(LongType)),
            propagateNull = false, returnNullable = false)
        case _ => throw InvalidSqlError("char", "expects at least one argument")
      }: Seq[Expression] => Expression),
      // unicode(s) — codepoint of the first character
      (FunctionIdentifier("unicode"), info("unicode"), {
        case Seq(e) => Ascii(e)
        case _ => throw InvalidSqlError("unicode", "expects one argument")
      }: Seq[Expression] => Expression),
      // zeroblob(n) — n zero bytes
      (FunctionIdentifier("zeroblob"), info("zeroblob"), {
        case Seq(n) => Unhex(StringRepeat(Literal("00"), Cast(n, IntegerType)))
        case _ => throw InvalidSqlError("zeroblob", "expects one argument")
      }: Seq[Expression] => Expression),
      // typeof(x) — SQLite STORAGE-CLASS names (integer/real/text/blob/
      // null), overriding Spark's catalyst-type-name typeof inside the
      // dialect session (documented; the inner TypeOf is the builtin)
      (FunctionIdentifier("typeof"), info("typeof"), {
        case Seq(e) =>
          val t = TypeOf(e)
          CaseWhen(Seq(
            (IsNull(e), Literal("null")),
            (In(t, Seq(Literal("tinyint"), Literal("smallint"), Literal("int"),
              Literal("bigint"), Literal("boolean"))), Literal("integer")),
            (Or(In(t, Seq(Literal("float"), Literal("double"))),
              StartsWith(t, Literal("decimal"))), Literal("real")),
            (EqualTo(t, Literal("binary")), Literal("blob"))),
            Some(Literal("text")))
        case _ => throw InvalidSqlError("typeof", "expects one argument")
      }: Seq[Expression] => Expression))
  }

  /** SQLite GLOB pattern → anchored Java regex: `*`→`.*`, `?`→`.`,
    * `[...]` char classes pass through (SQLite semantics: `^` negates,
    * `!` is a LITERAL member, a `]` directly after `[` or `[^` is a
    * literal member), everything else quoted. */
  def globToRegex(glob: String): String = {
    val out = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => out.append(".*")
        case '?' => out.append('.')
        case '[' =>
          // closing ']' search skips an optional leading '^' and an
          // optional literal ']' first member (SQLite rules)
          var scanFrom = i + 1
          if (scanFrom < glob.length && glob.charAt(scanFrom) == '^') scanFrom += 1
          if (scanFrom < glob.length && glob.charAt(scanFrom) == ']') scanFrom += 1
          val end = glob.indexOf(']', scanFrom)
          if (end < 0) out.append("\\[")
          else {
            out.append('[')
            var j = i + 1
            if (glob.charAt(j) == '^') { out.append('^'); j += 1 }
            while (j < end) {
              val c = glob.charAt(j)
              // escape regex-class metacharacters except the range '-'
              if (c == ']' || c == '\\' || c == '[' || c == '&') out.append('\\')
              out.append(c)
              j += 1
            }
            out.append(']')
            i = end
          }
        case c if "\\.[]{}()<>+-=!$^|".indexOf(c) >= 0 => out.append('\\').append(c)
        case c => out.append(c)
      }
      i += 1
    }
    out.append('$').result()
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functionSpecs.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}

/** `SparkSessionExtensions` hook: enable the SQLite dialect cluster-wide
  * with `--conf spark.sql.extensions=graft.dialect.GraftSparkExtensions`
  * (no code changes in user jobs). */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    SqliteDialect.functionSpecs.foreach(ext.injectFunction)
}
