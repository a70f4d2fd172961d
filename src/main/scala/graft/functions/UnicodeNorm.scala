package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization kernels (NFC / NFKC), invoked from
  * whole-stage codegen via `StaticInvoke` like the other graft kernels.
  *
  * NFC is THE cross-engine-stable normalization: `java.text.Normalizer`
  * (UAX #15 via ICU data in the JDK) and DuckDB's `nfc_normalize`
  * (utf8proc) implement the same frozen algorithm — canonical
  * decomposition + canonical reordering + composition — and Unicode
  * normalization is stabilized (results never change for assigned
  * codepoints), so d16's oracle replays it byte-identically. NFKC adds
  * compatibility foldings (ligatures, full-width, superscripts); DuckDB
  * v1.0 exposes no NFKC function, so [[nfkc]] is spec-covered only and
  * never oracle-gated — the high-frequency compatibility classes are
  * separately covered by `TextAnalysis.foldConfusables`, which composes
  * with [[nfc]] for the full cleanup chain.
  *
  * The fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and
  * already-composed text short-circuits) that avoids allocating a copy
  * for the overwhelmingly-normalized real corpus.
  */
object UnicodeNormImpl {
  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)

  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)

  private def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

object UnicodeNorm {
  /** Column API: NFC-normalize a string column (NULL → NULL). */
  def nfc(c: Column): Column =
    ColumnBridge.column(nfcExpr(ColumnBridge.expression(c)))

  /** Column API: NFKC-normalize a string column (NULL → NULL; no DuckDB
    * oracle counterpart — see the object scaladoc). */
  def nfkc(c: Column): Column =
    ColumnBridge.column(nfkcExpr(ColumnBridge.expression(c)))

  /** Expression builders — shared with the SQL surface (`graft_nfc` /
    * `graft_nfkc` in [[SqlKernels]]). */
  private[functions] def nfcExpr(s: Expression): Expression = invoke("nfc", s)

  private[functions] def nfkcExpr(s: Expression): Expression =
    invoke("nfkc", s)

  private def invoke(method: String, s: Expression): Expression =
    StaticInvoke(
      UnicodeNormImpl.getClass, StringType, method,
      Seq(s), Seq(StringType),
      propagateNull = true, returnNullable = true)
}
