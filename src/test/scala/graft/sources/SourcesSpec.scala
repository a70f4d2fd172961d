package graft.sources

import java.nio.file.Files

import graft.{DuplicateColumnError, SparkSpec}
import org.apache.spark.sql.types._

/** Format-source specs over generated fixtures (FIXTURES.md). */
class SourcesSpec extends SparkSpec {

  private val sampleCsv =
    """id,name,age,email
      |1,Alice,30,alice@example.com
      |2,Bob,25,bob@example.com
      |3,Carol,35,carol@example.com
      |""".stripMargin

  test("CSV: header, inference (INTEGER/TEXT), values") {
    val dir = tmpDir("csv")
    val p = writeFile(dir, "sample.csv", sampleCsv)
    val df = CsvSource.readCsv(spark, p)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("name").dataType == StringType)
    assert(df.schema("age").dataType == LongType)
    assert(df.count() == 3)
    assert(df.filter("age > 25").count() == 2)
  }

  test("CSV: RFC-4180 quoted fields with embedded delimiter and doubled quotes") {
    val dir = tmpDir("csvq")
    val p = writeFile(dir, "q.csv",
      "id,note\n1,\"hello, world\"\n2,\"say \"\"hi\"\"\"\n")
    val df = CsvSource.readCsv(spark, p)
    val notes = df.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(notes == Seq("hello, world", "say \"hi\""))
  }

  test("CSV: duplicate column names rejected") {
    val dir = tmpDir("csvdup")
    val p = writeFile(dir, "duplicate_columns.csv", "id,name,id,email\n1,a,2,b\n")
    intercept[DuplicateColumnError](CsvSource.readCsv(spark, p))
  }

  test("CSV: datetime column inferred and cast to timestamp") {
    val dir = tmpDir("csvdt")
    val p = writeFile(dir, "t.csv",
      "id,created_at\n1,2023-01-01 10:00:00\n2,2023-06-15 12:30:45\n")
    val df = CsvSource.readCsv(spark, p)
    assert(df.schema("created_at").dataType == TimestampType)
    assert(df.filter("created_at >= '2023-06-01'").count() == 1)
  }

  test("CSV: mixed int/real column becomes REAL; empty cells become NULL") {
    val dir = tmpDir("csvreal")
    val p = writeFile(dir, "r.csv", "id,score\n1,10\n2,9.5\n3,\n")
    val df = CsvSource.readCsv(spark, p)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.filter("score IS NULL").count() == 1)
  }

  test("TSV: tab-delimited parse + inference") {
    val dir = tmpDir("tsv")
    val p = writeFile(dir, "products.tsv",
      "id\tname\tprice\n1\tWidget\t100\n2\tGadget\t250\n3\tDoohickey\t75\n")
    val df = CsvSource.readTsv(spark, p)
    assert(df.schema("price").dataType == LongType)
    assert(df.count() == 3)
  }

  test("LTSV: union of keys, missing keys empty, sorted columns") {
    val dir = tmpDir("ltsv")
    val p = writeFile(dir, "logs.ltsv",
      "time:2024-01-01T10:00:00Z\tlevel:info\tmessage:started\n" +
        "time:2024-01-01T10:05:00Z\tlevel:warn\tmessage:high load\textra:x\n")
    val df = LtsvSource.read(spark, p)
    assert(df.columns.toSeq == Seq("extra", "level", "message", "time"))
    assert(df.schema("time").dataType == TimestampType)
    // first row has no "extra" key → "" → NULL is not expected for TEXT: stays ""
    assert(df.filter("extra = ''").count() == 1)
  }

  test("LTSV: values containing colons survive") {
    val dir = tmpDir("ltsvc")
    val p = writeFile(dir, "l.ltsv", "url:http://x/y:8080\tcode:200\n")
    val df = LtsvSource.read(spark, p)
    assert(df.select("url").head().getString(0) == "http://x/y:8080")
  }

  test("compression matrix: gz/bz2/xz/zst CSV round-trip reads") {
    val dir = tmpDir("comp")
    for (codec <- Compression.All) {
      val p = dir.resolve(s"sample.csv${codec.ext}")
      val out = Compression.openWrite(p.toString)
      out.write(sampleCsv.getBytes("UTF-8")); out.close()
      val df = CsvSource.readCsv(spark, p.toString)
      assert(df.count() == 3, s"codec ${codec.ext}")
      assert(df.schema("age").dataType == LongType, s"codec ${codec.ext}")
    }
  }

  test("XLSX: write → read round trip, sheet naming, short-row padding") {
    val dir = tmpDir("xlsx")
    val p = dir.resolve("book.xlsx")
    val out = Files.newOutputStream(p)
    XlsxSource.write(out, "Sheet One", Seq("id", "name", "val"),
      Iterator(Seq("1", "a", "10"), Seq("2", "b <&> \"q\"", "20"), Seq("3", "c", "30")))
    out.close()
    val sheets = XlsxSource.readAllSheets(spark, p.toString)
    assert(sheets.map(_._1) == Seq("book_Sheet_One"))
    val df = sheets.head._2
    assert(df.columns.toSeq == Seq("id", "name", "val"))
    assert(df.schema("id").dataType == LongType)
    assert(df.count() == 3)
    assert(df.filter("name = 'b <&> \"q\"'").count() == 1) // XML escaping round-trips
  }

  test("file collection: uncompressed beats compressed duplicate") {
    val dir = tmpDir("dedup")
    writeFile(dir, "users.csv", "id,name\n1,a\n")
    val gz = dir.resolve("users.csv.gz")
    val out = Compression.openWrite(gz.toString)
    out.write("id,name\n1,a\n2,b\n".getBytes("UTF-8")); out.close()
    val files = graft.session.FileCollector.collect(Seq(dir.toString))
    assert(files.map(_.path) == Seq(dir.resolve("users.csv").toString))
  }
}
