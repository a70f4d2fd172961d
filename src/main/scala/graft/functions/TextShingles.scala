package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused lowercase → whitespace-tokenize → word n-gram → distinct kernel
  * (same pattern as [[SimHashImpl]]): one pass over the text, one output
  * allocation. Semantics identical to
  * `Dedup.wordShingles(TextAnalysis.tokens(text), n)`:
  * fewer-than-n tokens yield a single all-tokens shingle; first-occurrence
  * order is kept. */
object TextShinglesImpl {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val out = mutable.LinkedHashSet.empty[String]
    if (tokens.length < n) out += tokens.mkString(" ")
    else {
      var i = 0
      while (i + n <= tokens.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j)); j += 1
        }
        out += sb.toString
        i += 1
      }
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}

object TextShingles {
  /** Column API: distinct word n-gram shingles straight from a text column. */
  def textShingles(text: Column, n: Int): Column =
    ColumnBridge.column(textShinglesExpr(ColumnBridge.expression(text), n))

  /** Expression builder — shared with [[SqlKernels]]'s `graft_shingles`. */
  private[functions] def textShinglesExpr(
      text: org.apache.spark.sql.catalyst.expressions.Expression, n: Int)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      TextShinglesImpl.getClass, ArrayType(StringType, containsNull = false), "shingles",
      Seq(text, Literal(n)),
      Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = false)
}
