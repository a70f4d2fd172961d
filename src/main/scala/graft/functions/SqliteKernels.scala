package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for SQLite dialect functions no built-in Catalyst
  * expression expresses exactly — invoked from codegen via
  * `StaticInvoke`, same pattern as [[MinHashImpl]]. */
object SqliteKernelsImpl {

  /** SQLite `char(c1, c2, …)`: string from UNICODE CODEPOINTS. Spark's
    * `chr` is defined as chr(n % 256), so it diverges for every
    * codepoint above U+00FF (char(1055) must be 'П', not chr(31)).
    * SQLite semantics exactly: NULL coerces to codepoint 0 and
    * out-of-range (or surrogate — invalid alone in a JVM string) values
    * become U+FFFD. */
  def charFromCodepoints(arr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      val cp = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      val valid = cp >= 0 && cp <= Character.MAX_CODE_POINT &&
        !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE)
      sb.appendCodePoint(if (valid) cp.toInt else 0xFFFD)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
