package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop BPE merge-chain segmentation, invoked from codegen (same
  * `StaticInvoke` pattern as [[MinHashImpl]] / [[SimHashImpl]]).
  *
  * The declarative form — `numMerges` chained literal `replace` calls on
  * the space-wrapped word (`Bpe.applyMerge`) — is a SINGLE nested
  * expression linear in the merge count: at production merge tables
  * (8k–32k merges) its generated code blows the 64 KB JVM method limit
  * (nested call arguments cannot be split into sub-methods), falling back
  * to interpreted evaluation, and the fold does O(len) string work per
  * merge regardless. This kernel runs the same chain as a loop over a
  * symbol array: per merge, one left-to-right non-overlapping fuse pass.
  *
  * Semantics are EXACTLY the replace chain's (pinned bitwise in
  * `KernelParitySpec`): in the space-wrapped form `" l  r "` can only
  * match two complete adjacent symbols (a symbol is flanked by double
  * spaces, so the pattern's single-space ends force symbol-start and
  * symbol-end alignment), and literal `replace` fuses occurrences
  * left-to-right non-overlapping — which is precisely the in-place fuse
  * scan below, including back-to-back runs (`aaaa` + merge `(a,a)` →
  * `[aa, aa]`). Merges are applied once each, in the order given (= rank
  * order), never revisited — the cross-engine contract the DuckDB oracle
  * replays.
  */
object BpeSegmentImpl {

  /** Per-thread memo of the last-seen parsed merge table: codegen embeds
    * the two merge literals as shared references, so every row of a task
    * passes the same `ArrayData` instances and the parse is paid once per
    * (thread, merge table), not per row. */
  private val memo =
    new ThreadLocal[(ArrayData, ArrayData, Array[String], Array[String])]

  private def parsed(lefts: ArrayData, rights: ArrayData): (Array[String], Array[String]) = {
    val m = memo.get()
    if (m != null && (m._1 eq lefts) && (m._2 eq rights)) (m._3, m._4)
    else {
      val n = lefts.numElements()
      val ls = new Array[String](n)
      val rs = new Array[String](n)
      var i = 0
      while (i < n) {
        ls(i) = lefts.getUTF8String(i).toString
        rs(i) = rights.getUTF8String(i).toString
        i += 1
      }
      memo.set((lefts, rights, ls, rs))
      (ls, rs)
    }
  }

  /** Segment one word through the merge chain: `array<string>` of
    * subword symbols. Initial symbols are code points (matching the
    * `regexp_replace(w, "(.)", …)` spaced form; the learn path scopes
    * words to lowercase ASCII anyway). */
  def segment(word: UTF8String, lefts: ArrayData, rights: ArrayData): ArrayData = {
    val (ls, rs) = parsed(lefts, rights)
    val w = word.toString
    // split into code points
    var syms = new Array[String](w.length)
    var n = 0
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val cc = Character.charCount(cp)
      syms(n) = w.substring(ci, ci + cc)
      n += 1
      ci += cc
    }
    // apply each merge once, in order: one left-to-right fuse pass
    var m = 0
    while (m < ls.length && n > 1) {
      val l = ls(m)
      val r = rs(m)
      var i = 0
      var o = 0
      while (i < n) {
        if (i + 1 < n && syms(i).equals(l) && syms(i + 1).equals(r)) {
          syms(o) = syms(i).concat(syms(i + 1))
          i += 2
        } else {
          if (o != i) syms(o) = syms(i)
          i += 1
        }
        o += 1
      }
      n = o
      m += 1
    }
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

object BpeSegment {
  /** Column API: subword segmentation of a word column through a merge
    * chain (applied once each, in the given order). The merge table
    * rides into the plan as two array literals — constant-size codegen
    * regardless of merge count, unlike the chained-`replace` fold. */
  def segment(word: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "BpeSegment.segment: empty merge symbol")
    val at = ArrayType(StringType, containsNull = false)
    ColumnBridge.column(StaticInvoke(
      BpeSegmentImpl.getClass, at, "segment",
      Seq(ColumnBridge.expression(word),
        Literal.create(merges.map(_._1), at),
        Literal.create(merges.map(_._2), at)),
      Seq(StringType, at, at),
      propagateNull = true, returnNullable = false))
  }
}
