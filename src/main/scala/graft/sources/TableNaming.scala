package graft.sources

/** Table-name derivation and sanitization.
  *
  * Reference semantics: `table.go:72-83` (path → name: basename, strip one
  * compression extension, then the format extension) and `types.go:74-109` /
  * `builder.go:571-599` (sanitize: space/`-`/`.` → `_`, drop other
  * non-alphanumerics, prefix when leading digit, fallback name).
  */
object TableNaming {

  /** `users.csv` → `users`; `data.tsv.gz` → `data` (`table.go:72-83`). */
  def fromPath(path: String): String = {
    val base = path.split('/').last
    val noComp = Compression.ByExtension.keys
      .find(ext => base.endsWith(ext))
      .map(ext => base.dropRight(ext.length))
      .getOrElse(base)
    val dot = noComp.lastIndexOf('.')
    if (dot > 0) noComp.substring(0, dot) else noComp
  }

  /** Sanitize an identifier (`types.go:74-109`): keep [A-Za-z0-9_],
    * map space/`-`/`.` to `_`, prefix when starting with a digit,
    * fallback when empty. */
  def sanitize(name: String, digitPrefix: String = "table_", fallback: String = "table"): String = {
    val mapped = name.map {
      case ' ' | '-' | '.' => '_'
      case c => c
    }.filter(c => c.isLetterOrDigit && c < 128 || c == '_')
    val nonEmpty =
      if (mapped.nonEmpty && mapped.head.isDigit) digitPrefix + mapped
      else mapped
    if (nonEmpty.isEmpty) fallback else nonEmpty
  }

  /** XLSX sheet-derived table name: `{filename}_{sheetname}`, sheet part
    * sanitized with the `sheet_` prefix rules (`stream_processor.go:326-417`). */
  def forSheet(filePath: String, sheetName: String): String =
    s"${sanitize(fromPath(filePath))}_${sanitize(sheetName, "sheet_", "sheet")}"
}
