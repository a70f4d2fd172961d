package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import TypeInference._

/** Ports the reference's inference unit-test semantics
  * (`types_test.go:171-749`, FIXTURES.md "inference edge-case fixtures"). */
class TypeInferenceSpec extends AnyFunSuite {

  private def infer(values: String*): ColType = inferType(values.toIndexedSeq)

  test("all integers ⇒ INTEGER") {
    assert(infer("1", "42", "-7", "+5") == IntegerType)
  }

  test("int + ≥10% floats ⇒ REAL") {
    assert(infer("1", "2", "3.5") == RealType)
  }

  test("floats alone ⇒ REAL") {
    assert(infer("1.5", "2.25", "1e3") == RealType)
  }

  test("<10% floats among ints still REAL only via threshold rule") {
    // 1 float among 20 values = 5% < MinRealThreshold, int confidence 95% ≥ 80% ⇒ INTEGER
    val vals = (1 to 19).map(_.toString) :+ "2.5"
    assert(inferType(vals.toIndexedSeq) == IntegerType)
  }

  test("any text value ⇒ TEXT") {
    assert(infer("1", "2", "abc") == TextType)
  }

  test(">50% text early-exit ⇒ TEXT") {
    assert(infer("a", "b", "c", "1") == TextType)
  }

  test("empty strings are skipped; all empty ⇒ TEXT") {
    assert(infer("", "  ", "") == TextType)
    assert(infer("", "3", "") == IntegerType)
  }

  test("no values ⇒ TEXT") {
    assert(inferType(IndexedSeq.empty) == TextType)
  }

  test("≥80% datetime ⇒ DATETIME") {
    assert(infer("2024-01-01", "2024-02-03", "2024-03-04", "2024-04-05", "5").isInstanceOf[DatetimeType])
  }

  test("<80% datetime mixed with ints falls back") {
    // 2 datetime + 3 int: datetime 40%, int 60% <80%, fallback order int>datetime
    assert(infer("2024-01-01", "2024-02-03", "1", "2", "3") == IntegerType)
  }

  test("datetime pattern families") {
    assert(datetimeFamily("2024-01-02T10:30:00Z").exists(_.name == "iso-tz"))
    assert(datetimeFamily("2024-01-02T10:30:00.123+05:00").exists(_.name == "iso-tz"))
    assert(datetimeFamily("2024-01-02T10:30:00").exists(_.name == "iso"))
    assert(datetimeFamily("2024-01-02 10:30:00").exists(_.name == "iso-space"))
    assert(datetimeFamily("2024-01-02 10:30:00.5").exists(_.name == "iso-space"))
    assert(datetimeFamily("2024-01-02").exists(_.name == "date"))
    assert(datetimeFamily("1/2/2024 15:04:05").exists(_.name == "us-datetime"))
    assert(datetimeFamily("1/2/2024 3:04:05 PM").exists(_.name == "us-datetime"))
    assert(datetimeFamily("12/31/2024").exists(_.name == "us-date"))
    assert(datetimeFamily("31.12.2024 23:59:59").exists(_.name == "euro-datetime"))
    assert(datetimeFamily("31.12.2024").exists(_.name == "euro-date"))
    assert(datetimeFamily("15:04:05").exists(_.name == "time-sec"))
    assert(datetimeFamily("15:04").exists(_.name == "time-min"))
  }

  test("datetime rejects invalid calendar dates and junk") {
    assert(datetimeFamily("2024-13-01").isEmpty) // month 13
    assert(datetimeFamily("2/30/2024").isEmpty) // Feb 30
    assert(datetimeFamily("25:00:00").isEmpty) // hour 25
    assert(datetimeFamily("abc").isEmpty)
    assert(datetimeFamily("12").isEmpty) // too short
    assert(datetimeFamily("1234567890123456789012345678901234567890").isEmpty) // too long
  }

  test("classification order: datetime wins over numeric-looking") {
    // "15:04" is datetime, not text; plain "1504" is integer
    assert(classify("15:04").isInstanceOf[DatetimeType])
    assert(classify("1504") == IntegerType)
  }

  test("stratified sampling caps at MaxSampleSize and is deterministic") {
    val big = (0 until 10000).map(_.toString)
    val s1 = sampleValues(big)
    val s2 = sampleValues(big)
    assert(s1.length <= MaxSampleSize)
    assert(s1 == s2)
    // touches begin/middle/end sections
    assert(s1.exists(v => v.toInt < 3333))
    assert(s1.exists(v => v.toInt >= 3333 && v.toInt < 6666))
    assert(s1.exists(v => v.toInt >= 6666))
  }

  test("50k values infer under 1s (reference perf guard types_test.go:681-749)") {
    val vals = (0 until 50000).map(i => if (i % 2 == 0) i.toString else (i + 0.5).toString)
    val t0 = System.nanoTime()
    val result = inferType(vals.toIndexedSeq)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(result == RealType)
    assert(elapsed < 1.0, s"inference took ${elapsed}s")
  }
}
