package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.foldConfusables]] — the adversarial-web confusable/
  * zero-width fold layer under the d15 gate. */
class TextFoldSpec extends SparkSpec {

  import spark.implicits._

  private def fold(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.foldConfusables(col("t")).as("f"))
      .head().getString(0)

  test("fold table shape: from/to lengths equal (translate must MAP, never drop)") {
    assert(TextAnalysis.ConfusableFrom.length == TextAnalysis.ConfusableTo.length,
      s"${TextAnalysis.ConfusableFrom.length} vs ${TextAnalysis.ConfusableTo.length}")
    // no duplicate sources (a repeated from-char would shadow its later mapping)
    assert(TextAnalysis.ConfusableFrom.distinct.length == TextAnalysis.ConfusableFrom.length)
    // ligature sources are single codepoints outside the translate table
    TextAnalysis.LigatureFolds.foreach { case (from, _) =>
      assert(from.length == 1 && !TextAnalysis.ConfusableFrom.contains(from)) }
  }

  test("confusable classes fold: ligatures, full-width, spaces, quotes, dashes, zero-width") {
    assert(fold("ﬁle") == "file") // ﬁle
    assert(fold("ﬀﬃﬆ") == "ffffist")
    assert(fold("ｗｏｒｄ！") == "word!")
    assert(fold("ＡＢＣ　ｘｙｚ") == "ABC xyz") // ideographic space
    assert(fold("a\u00A0b\u2009c\u202Fd") == "a b c d") // NBSP/thin/narrow spaces
    assert(fold("‘q’ “d”") == "'q' \"d\"")
    assert(fold("5−3 en–dash em—dash") == "5-3 en-dash em-dash")
    assert(fold("wait… 1⁄2") == "wait... 1/2")
    assert(fold("z\u200Be\u200Cr\u200Do\uFEFF") == "zero")
    assert(fold("bidi\u202Ectrl\u202C iso\u2066late\u2069") == "bidictrl isolate")
    // plain ASCII is a fixed point
    val ascii = "The quick brown fox -- 42 / 'ok' \"q\"!"
    assert(fold(ascii) == ascii)
  }

  test("idempotent: every output codepoint is a fixed point of the chain") {
    val torture = TextAnalysis.ZeroWidthChars +
      TextAnalysis.ConfusableFrom +
      TextAnalysis.LigatureFolds.map(_._1).mkString +
      " mixed ｔｅｘｔ\u200Bﬂow…"
    val once = fold(torture)
    assert(fold(once) == once)
    // and the folded torture string is pure ASCII (everything folded)
    assert(once.forall(_ < 0x80), once.filter(_ >= 0x80).map(c => f"U+${c.toInt}%04X"))
  }

  test("normalizeForDedup ∘ foldConfusables equates the d15 plant variants with their base") {
    val base = "Hello World, final offer!"
    val zw = "\uFEFF" + base.replace(" ", " \u200B")
    val fw = base.replace("fi", "ﬁ")
      .map(c => if ("aeiost ".contains(c))
        (if (c == ' ') '\u00A0' else (c + 0xFEE0).toChar) else c)
    val keys = Seq(base, zw, fw).map { s =>
      Seq(Tuple1(s)).toDF("t").select(
        TextAnalysis.normalizeForDedup(
          TextAnalysis.foldConfusables(col("t"))).as("k")).head().getString(0)
    }
    assert(keys.distinct.size == 1, keys)
    // and WITHOUT the fold they are three different keys (the gate is not vacuous)
    val rawKeys = Seq(base, zw, fw).map { s =>
      Seq(Tuple1(s)).toDF("t").select(
        TextAnalysis.normalizeForDedup(col("t")).as("k")).head().getString(0)
    }
    assert(rawKeys.distinct.size == 3, rawKeys)
  }
}
