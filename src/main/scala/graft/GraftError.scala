package graft

/** Error taxonomy ≈ reference sentinel errors (`errors.go:10-89`). */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)

final case class DuplicateColumnError(table: String, column: String)
  extends GraftError(s"duplicate column name '$column' in table '$table'")

final case class DuplicateTableError(table: String)
  extends GraftError(s"duplicate table name '$table' (merging is not supported)")

final case class UnsupportedFormatError(path: String)
  extends GraftError(s"unsupported file format: $path")

final case class EmptyInputError()
  extends GraftError("at least one path must be provided")

final case class NoDataError(path: String)
  extends GraftError(s"file contains no data: $path")

final case class InvalidSqlError(statement: String, reason: String)
  extends GraftError(s"invalid statement ($reason): $statement")

/** A statement class the reference supports via SQLite but this engine
  * deliberately does not emulate (e.g. INSTEAD OF triggers) — a typed
  * error beats a raw Catalyst parse exception. */
final case class UnsupportedStatementError(statement: String, reason: String)
  extends GraftError(s"unsupported statement ($reason): $statement")

/** A trigger body executed `RAISE(ABORT|FAIL|ROLLBACK, msg)` — the outer
  * DML statement (and every trigger effect it caused) has been rolled
  * back; kind ROLLBACK additionally rolls back the enclosing
  * transaction, matching SQLite's abort semantics. (FAIL is treated as
  * ABORT: SQLite's keep-prior-changes FAIL nuance is not reproduced —
  * the whole statement rolls back. Documented deviation.) */
final case class TriggerAbortError(trigger: String, kind: String, message: String)
  extends GraftError(s"trigger $trigger aborted the statement ($kind): $message")
