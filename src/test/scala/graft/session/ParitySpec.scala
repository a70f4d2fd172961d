package graft.session

import graft.SparkSpec
import graft.sources.XlsxSource

/** Parity edge cases ported from reference test areas:
  * reserved-word table names (`filesql_test.go:1892-2274`), unicode
  * (`:1736`), CREATE VIEW (`README.md:334`), multi-row INSERT, XLSX
  * multi-sheet (`README.md:380-415`), embedded-FS loading
  * (`file_processor.go:114-214`). */
class ParitySpec extends SparkSpec {

  test("reserved SQL words as table names (quoted with backticks)") {
    val dir = tmpDir("reserved")
    writeFile(dir, "order.csv", "id,item\n1,apple\n2,pear\n")
    writeFile(dir, "select.csv", "id,v\n1,10\n")
    val s = GraftSession.open(spark, dir.toString)
    assert(s.sql("SELECT COUNT(*) FROM `order`").head().getLong(0) == 2)
    assert(s.sql("SELECT v FROM `select` WHERE id = 1").head().getLong(0) == 10)
    s.close()
  }

  test("unicode data and column values survive load and query") {
    val dir = tmpDir("unicode")
    writeFile(dir, "intl.csv",
      "id,name,city\n1,FranÃ§ois,MÃ¼nchen\n2,æ—¥æœ¬èªž,æ±äº¬\n3,Ð ÑƒÑÑÐºÐ¸Ð¹,ÐœÐ¾ÑÐºÐ²Ð°\n")
    val s = GraftSession.open(spark, dir.toString)
    assert(s.sql("SELECT name FROM intl WHERE city = 'æ±äº¬'").head().getString(0) == "æ—¥æœ¬èªž")
    assert(s.sql("SELECT COUNT(*) FROM intl WHERE name = 'FranÃ§ois'").head().getLong(0) == 1)
    s.close()
  }

  test("CREATE TEMPORARY VIEW over loaded tables") {
    val dir = tmpDir("view")
    writeFile(dir, "t.csv", "id,v\n1,10\n2,20\n3,30\n")
    val s = GraftSession.open(spark, dir.toString)
    s.sql("CREATE OR REPLACE TEMPORARY VIEW big AS SELECT * FROM t WHERE v >= 20")
    assert(s.sql("SELECT COUNT(*) FROM big").head().getLong(0) == 2)
    s.close()
  }

  test("INSERT with multiple VALUES tuples and expressions") {
    val dir = tmpDir("multiinsert")
    writeFile(dir, "t.csv", "id,v\n1,10\n")
    val s = GraftSession.open(spark, dir.toString)
    s.sql("INSERT INTO t VALUES (2, 20), (3, 10 + 20), (4, abs(-40))")
    assert(s.sql("SELECT SUM(v) FROM t").head().getLong(0) == 100)
    s.close()
  }

  test("XLSX multi-sheet workbook: one table per sheet, {file}_{sheet} names") {
    val dir = tmpDir("multisheet")
    val p = dir.resolve("book.xlsx")
    val out = java.nio.file.Files.newOutputStream(p)
    XlsxSource.writeWorkbook(out, Seq(
      XlsxSource.SheetData("Staff", Seq("id", "name"), Iterator(Seq("1", "ann"), Seq("2", "bo"))),
      XlsxSource.SheetData("2024 Sales", Seq("id", "amt"), Iterator(Seq("1", "9.5")))))
    out.close()
    val s = GraftSession.open(spark, p.toString)
    assert(s.tableNames.toSet == Set("book_Staff", "book_sheet_2024_Sales"))
    assert(s.sql("SELECT COUNT(*) FROM book_Staff").head().getLong(0) == 2)
    assert(s.sql("SELECT amt FROM book_sheet_2024_Sales").head().getDouble(0) == 9.5)
    s.close()
  }

  test("INSERT INTO ... SELECT maps by position; REPLACE INTO parses as insert") {
    val dir = tmpDir("insertselect")
    writeFile(dir, "people.csv", "id,name,age\n1,Ann,30\n2,Bo,40\n")
    val s = GraftSession.open(spark, dir.toString)
    // positional mapping with a column list; unlisted columns become NULL
    s.sql("INSERT INTO people (id, name) SELECT id + 10, upper(name) FROM people WHERE age > 35")
    assert(s.sql("SELECT name FROM people WHERE id = 12").head().getString(0) == "BO")
    assert(s.sql("SELECT age FROM people WHERE id = 12").head().isNullAt(0))
    // full-width INSERT SELECT
    s.sql("INSERT INTO people SELECT id + 100, name, age FROM people WHERE id <= 2")
    assert(s.sql("SELECT COUNT(*) FROM people").head().getLong(0) == 5)
    assert(s.sql("SELECT changes()").head().getLong(0) == 2)
    // SQLite's bare REPLACE INTO alias
    s.sql("REPLACE INTO people VALUES (9, 'Cy', 25)")
    assert(s.sql("SELECT COUNT(*) FROM people WHERE id = 9").head().getLong(0) == 1)
    // arity mismatch is a typed error
    intercept[graft.InvalidSqlError](
      s.sql("INSERT INTO people (id, name) SELECT id FROM people"))
    // quoted / differently-cased column lists resolve like SQLite
    s.sql("INSERT INTO people (\"ID\", NAME) SELECT id + 500, name FROM people WHERE id = 9")
    assert(s.sql("SELECT name FROM people WHERE id = 509").head().getString(0) == "Cy")
    s.close()
  }

  test("INSERT ... SELECT on a rowid table assigns fresh rowids, hidden from the column list") {
    val dir = tmpDir("insertselectrowid")
    writeFile(dir, "p.csv", "id,name\n1,Ann\n2,Bo\n")
    val s = GraftSession.builder().addPath(dir.toString).withRowId().open(spark)
    // full-width INSERT...SELECT covers the VISIBLE columns only — the
    // implicit rowid never participates (SQLite hidden-rowid semantics)
    s.sql("INSERT INTO p SELECT id + 10, upper(name) FROM p")
    val rowids = s.sql("SELECT rowid FROM p").collect().map(_.getLong(0))
    assert(rowids.length == 4 && rowids.distinct.length == 4,
      s"inserted rows must get fresh unique rowids, got ${rowids.toSeq}")
    assert(s.sql("SELECT COUNT(*) FROM p WHERE rowid IS NULL").head().getLong(0) == 0)
    assert(s.sql("SELECT changes()").head().getLong(0) == 2)
    assert(s.sql("SELECT last_insert_rowid()").head().getLong(0) == rowids.max)
    s.close()
  }

  test("DELETE leaves rows whose predicate is NULL (SQL three-valued logic)") {
    val dir = tmpDir("delnull")
    writeFile(dir, "t.csv", "id,x\n1,5\n2,50\n3,\n") // row 3: x is NULL after inference
    val s = GraftSession.open(spark, dir.toString)
    s.sql("DELETE FROM t WHERE x > 10")
    val ids = s.sql("SELECT id FROM t ORDER BY id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 3L)) // NULL-predicate row survives
    s.close()
  }

  test("UPDATE evaluates all SET expressions against the pre-update row (swap)") {
    val dir = tmpDir("updswap")
    writeFile(dir, "t.csv", "id,a,b\n1,10,20\n")
    val s = GraftSession.open(spark, dir.toString)
    s.sql("UPDATE t SET a = b, b = a")
    val r = s.sql("SELECT a, b FROM t").head()
    assert(r.getLong(0) == 20 && r.getLong(1) == 10)
    s.close()
  }

  test("UPDATE with the word WHERE inside a string literal") {
    val dir = tmpDir("updstr")
    writeFile(dir, "t.csv", "id,note\n1,x\n2,y\n")
    val s = GraftSession.open(spark, dir.toString)
    s.sql("UPDATE t SET note = 'a WHERE b' WHERE id = 1")
    val notes = s.sql("SELECT note FROM t ORDER BY id").collect().map(_.getString(0)).toSeq
    assert(notes == Seq("a WHERE b", "y"))
    s.close()
  }

  test("single-sheet XLSX table is named {file}_{sheet} like multi-sheet") {
    val dir = tmpDir("singlesheet")
    val p = dir.resolve("report.xlsx")
    val out = java.nio.file.Files.newOutputStream(p)
    XlsxSource.write(out, "Data", Seq("id"), Iterator(Seq("1")))
    out.close()
    val s = GraftSession.open(spark, p.toString)
    assert(s.tableNames == Seq("report_Data"))
    s.close()
  }

  test("multiple compressed variants with no uncompressed original: one survives") {
    val dir = tmpDir("compdup")
    for (codec <- Seq(graft.sources.Compression.Gzip, graft.sources.Compression.Bzip2)) {
      val out = graft.sources.Compression.openWrite(dir.resolve(s"users.csv${codec.ext}").toString)
      out.write("id,name\n1,a\n".getBytes("UTF-8")); out.close()
    }
    val s = GraftSession.open(spark, dir.toString) // must not throw DuplicateTableError
    assert(s.tableNames == Seq("users"))
    assert(s.sql("SELECT COUNT(*) FROM users").head().getLong(0) == 1)
    s.close()
  }

  test("auto-save with empty outputDir overwrites the input directory, not its parent") {
    val parent = tmpDir("asparent")
    val dataDir = parent.resolve("tables")
    java.nio.file.Files.createDirectories(dataDir)
    java.nio.file.Files.writeString(dataDir.resolve("t.csv"), "id\n1\n2\n")
    val s = GraftSession.builder().addPath(dataDir.toString).enableAutoSave().open(spark)
    s.sql("DELETE FROM t WHERE id = 2")
    s.close()
    assert(!java.nio.file.Files.exists(parent.resolve("t.csv"))) // not in parent
    val s2 = GraftSession.open(spark, dataDir.resolve("t.csv").toString)
    assert(s2.sql("SELECT COUNT(*) FROM t").head().getLong(0) == 1)
    s2.close()
  }

  test("dotfiles: skipped during directory walks, explicit pass errors clearly") {
    val dir = tmpDir("dotfiles")
    writeFile(dir, "normal.csv", "id\n1\n")
    writeFile(dir, ".hidden.csv", "id\n1\n2\n")
    val s = GraftSession.open(spark, dir.toString)
    assert(s.tableNames == Seq("normal")) // walk skips the dotfile
    s.close()
    // Spark/Hadoop sources ignore hidden files — we refuse loudly rather
    // than open a silently empty session
    val e = intercept[graft.UnsupportedFormatError](
      GraftSession.open(spark, dir.resolve(".hidden.csv").toString))
    assert(e.getMessage.contains("hidden"))
  }

  test("addFS: glob walk over a zip filesystem (embed.FS parity)") {
    val dir = tmpDir("fszip")
    val zipPath = dir.resolve("bundle.zip")
    val zip = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zipPath))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("data/users.csv", "id,name\n1,ann\n2,bo\n")
    entry("data/sub/events.csv", "eid,kind\n7,click\n")
    entry("data/readme.txt", "not a table")
    entry("data/.hidden.csv", "id\n1\n")
    zip.finish(); zip.close()
    val zfs = java.nio.file.FileSystems.newFileSystem(zipPath)
    try {
      val s = GraftSession.builder()
        .addFS(zfs.getPath("/"), "**.csv")
        .open(spark)
      // recursive walk, glob filter (readme.txt out), hidden file skipped
      assert(s.tableNames.toSet == Set("users", "events"))
      assert(s.sql("SELECT COUNT(*) FROM users").head().getLong(0) == 2)
      assert(s.sql("SELECT kind FROM events").head().getString(0) == "click")
      s.close()
    } finally zfs.close()
  }

  test("dynamic-typing deviation: TEXT-column comparisons use numeric coercion, not SQLite type ordering") {
    // SQLite orders ALL text above ALL numbers: on a TEXT column,
    //   WHERE v > 25  matches '30', '9', AND 'abc' (doc.go:68-76 implies
    // full SQLite semantics). This engine keeps Spark/ANSI coercion —
    // the string is cast to a number, non-numeric becomes NULL and drops
    // out. SURVEY §4 deliberately rejects emulating SQLite affinity
    // globally; this spec pins the documented deviation.
    val dir = tmpDir("affinity")
    writeFile(dir, "vals.csv", "id,v\n1,30\n2,9\n3,abc\n")
    val s = GraftSession.builder().addPath(dir.toString)
      .withoutTypeInference() // v stays a TEXT column
      .open(spark)
    // fully-numeric TEXT data compares numerically (same rows as SQLite
    // would match — though SQLite matches them via type ordering)
    assert(s.sql("SELECT COUNT(*) FROM vals WHERE id > 2").head().getLong(0) == 1)
    // non-numeric text in a numeric comparison: ANSI Spark THROWS a cast
    // error where SQLite would match the row via text-above-numbers
    intercept[Exception](s.sql("SELECT id FROM vals WHERE v > 25").collect())
    // TRY_CAST is the portable escape hatch: non-numeric → NULL → dropped
    val got = s.sql("SELECT id FROM vals WHERE TRY_CAST(v AS INT) > 25")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1"), s"TRY_CAST keeps only numeric-parsing rows > 25, got $got")
    s.close()
  }

  test("classpath resource loading (embedded-FS parity)") {
    // stage a resource dir on a throwaway classloader
    val dir = tmpDir("resources")
    val sub = dir.resolve("fixtures")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.writeString(sub.resolve("embedded.csv"), "id,name\n1,zed\n")
    val loader = new java.net.URLClassLoader(Array(dir.toUri.toURL), null)
    val s = GraftSession.builder()
      .addResource("fixtures/embedded.csv", loader)
      .open(spark)
    assert(s.tableNames == Seq("embedded"))
    assert(s.sql("SELECT name FROM embedded").head().getString(0) == "zed")
    s.close()
  }
}
