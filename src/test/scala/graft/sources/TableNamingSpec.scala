package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ports reference naming semantics (`table.go:72-83`, `types.go:74-109`). */
class TableNamingSpec extends AnyFunSuite {

  test("table name from path strips format and compression extensions") {
    assert(TableNaming.fromPath("users.csv") == "users")
    assert(TableNaming.fromPath("/a/b/data.tsv.gz") == "data")
    assert(TableNaming.fromPath("logs.ltsv.xz") == "logs")
    assert(TableNaming.fromPath("t.parquet") == "t")
    assert(TableNaming.fromPath("book.xlsx") == "book")
    assert(TableNaming.fromPath("archive.csv.zst") == "archive")
  }

  test("sanitize maps space/dash/dot to underscore, drops other specials") {
    assert(TableNaming.sanitize("my table") == "my_table")
    assert(TableNaming.sanitize("a-b.c") == "a_b_c")
    assert(TableNaming.sanitize("weird!@#name") == "weirdname")
  }

  test("sanitize prefixes leading digit and falls back when empty") {
    assert(TableNaming.sanitize("2024data") == "table_2024data")
    assert(TableNaming.sanitize("!!!") == "table")
    assert(TableNaming.sanitize("123", "sheet_", "sheet") == "sheet_123")
    assert(TableNaming.sanitize("", "sheet_", "sheet") == "sheet")
  }

  test("xlsx sheet table name = {file}_{sheet}") {
    assert(TableNaming.forSheet("/x/sales.xlsx", "Q1 Report") == "sales_Q1_Report")
  }
}
