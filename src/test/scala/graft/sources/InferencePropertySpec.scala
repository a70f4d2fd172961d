package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for inference and naming invariants (SURVEY §5 test
  * plan: "add ScalaCheck property tests for inference/name-sanitization"). */
class InferencePropertySpec extends AnyFunSuite {

  import TypeInference._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("property: any column containing a non-numeric word is TEXT") {
    val word = Gen.alphaStr.map(s => if (s.isEmpty) "word" else s.take(29))
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L)), word) {
      (nums, w) =>
        // decision rule: any text value ⇒ TEXT
        inferType((nums.map(_.toString) :+ w).toIndexedSeq) == TextType
    })
  }

  test("property: all-integer columns infer INTEGER regardless of size/sign") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { nums =>
      inferType(nums.map(_.toString).toIndexedSeq) == IntegerType
    })
  }

  test("property: doubles with fractional parts infer REAL") {
    val frac = Gen.chooseNum(-1e6, 1e6).map(d => if (d == math.floor(d)) d + 0.5 else d)
    check(Prop.forAll(Gen.nonEmptyListOf(frac)) { ds =>
      inferType(ds.map(_.toString).toIndexedSeq) == RealType
    })
  }

  test("property: sampling caps at MaxSampleSize and draws only input values") {
    check(Prop.forAll(Gen.chooseNum(0, 20000)) { n =>
      val values = (0 until n).map(_.toString)
      val sample = sampleValues(values)
      val capped = values.length <= MaxSampleSize || sample.length <= MaxSampleSize
      capped && sample.forall(values.contains)
    })
  }

  test("property: sanitize output is always a valid identifier") {
    check(Prop.forAll { (s: String) =>
      val out = TableNaming.sanitize(s)
      out.nonEmpty && !out.head.isDigit &&
        out.forall(c => c == '_' || (c.isLetterOrDigit && c < 128))
    })
  }

  test("property: fromPath strips exactly compression+format extension") {
    val base = Gen.identifier.map(s => if (s.isEmpty) "t" else s)
    val fmt = Gen.oneOf("csv", "tsv", "ltsv", "parquet", "xlsx")
    val comp = Gen.oneOf("", ".gz", ".bz2", ".xz", ".zst")
    check(Prop.forAll(base, fmt, comp) { (b, f, c) =>
      TableNaming.fromPath(s"/x/$b.$f$c") == b
    })
  }
}
