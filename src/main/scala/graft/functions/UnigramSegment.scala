package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) word segmentation as a codegen
  * kernel: the minimum-total-cost split of a word into model pieces,
  * by dynamic programming over character positions — the serving half
  * of [[graft.ops.Unigram]], same `StaticInvoke` + literal-model shape
  * as [[BpeSegment]] (the model rides into the plan as two array
  * literals; constant-size generated code at any vocabulary size).
  *
  * Exact-integer contract (what makes the DuckDB oracle possible):
  * piece costs are integer surrogates for −log p (see
  * [[graft.ops.Unigram]]), the DP comparison is pure Long arithmetic,
  * and ties break deterministically — minimum cost first, then the
  * LONGEST candidate piece — exactly the `ORDER BY cand ASC, l DESC`
  * rule the oracle's unrolled waves replay. A word with an unreachable
  * end position (a character outside the model's alphabet) returns
  * atomically as `[word]` — the lenient pass-through every non-
  * learnable token already gets ([[graft.ops.Bpe.encode]] contract).
  */
object UnigramSegmentImpl {

  /** Per-thread memo of the last-seen model literals (the
    * [[BpeSegmentImpl]] pattern: codegen passes the same `ArrayData`
    * instances every row, so the lookup map is built once per
    * (thread, model), not per row). */
  private val memo = new ThreadLocal[
    (ArrayData, ArrayData, java.util.HashMap[String, java.lang.Long], Int)]

  private def parsed(pieces: ArrayData, costs: ArrayData)
      : (java.util.HashMap[String, java.lang.Long], Int) = {
    val m = memo.get()
    if (m != null && (m._1 eq pieces) && (m._2 eq costs)) (m._3, m._4)
    else {
      val n = pieces.numElements()
      val map = new java.util.HashMap[String, java.lang.Long](n * 2)
      var maxLen = 1
      var i = 0
      while (i < n) {
        val p = pieces.getUTF8String(i).toString
        map.put(p, costs.getLong(i))
        if (p.length > maxLen) maxLen = p.length
        i += 1
      }
      memo.set((pieces, costs, map, maxLen))
      (map, maxLen)
    }
  }

  /** Min-cost segmentation of one word; `[word]` when unreachable. */
  def segment(word: UTF8String, pieces: ArrayData, costs: ArrayData): ArrayData = {
    val (map, maxLen) = parsed(pieces, costs)
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = if (maxLen < i) maxLen else i
      while (l <= lMax) {
        val prev = best(i - l)
        if (prev != Long.MaxValue) {
          val c = map.get(w.substring(i - l, i))
          if (c != null) {
            val cand = prev + c.longValue()
            // cand < prev ⇔ the non-negative add wrapped: treat the
            // path as unreachable-expensive rather than letting a
            // negative cost win the min — [[graft.ops.Unigram]] sizes
            // costs so learn-scope words can't get here, but this
            // public surface accepts any (model, word) and must not
            // return garbage for longer words (the r8 one-level-
            // overflow class)
            if (cand >= prev &&
                (cand < best(i) || (cand == best(i) && l > bl(i)))) {
              best(i) = cand
              bl(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == Long.MaxValue)
      return new GenericArrayData(Array[AnyRef](word))
    // backward reconstruction, then reverse in place
    val tmp = new Array[AnyRef](n)
    var k = 0
    var pos = n
    while (pos > 0) {
      val l = bl(pos)
      tmp(k) = UTF8String.fromString(w.substring(pos - l, pos))
      k += 1
      pos -= l
    }
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) { out(j) = tmp(k - 1 - j); j += 1 }
    new GenericArrayData(out)
  }
}

object UnigramSegment {
  /** Column API: min-cost unigram segmentation of a word column under
    * a (piece, cost) model baked in as two array literals. */
  def segment(word: Column, model: Seq[(String, Long)]): Column = {
    require(model.nonEmpty, "UnigramSegment.segment: empty model")
    require(model.forall(_._1.nonEmpty), "UnigramSegment.segment: empty piece")
    require(model.forall(_._2 >= 0L),
      "UnigramSegment.segment: negative piece cost")
    val st = ArrayType(StringType, containsNull = false)
    val lt = ArrayType(LongType, containsNull = false)
    ColumnBridge.column(StaticInvoke(
      UnigramSegmentImpl.getClass, st, "segment",
      Seq(ColumnBridge.expression(word),
        Literal.create(model.map(_._1), st),
        Literal.create(model.map(_._2), lt)),
      Seq(StringType, st, lt),
      propagateNull = true, returnNullable = false))
  }
}
