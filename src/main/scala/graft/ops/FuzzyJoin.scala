package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: blocked fuzzy join on string keys, exhaustive at a
  * bounded edit distance, never all-pairs.
  *
  * Blocking scheme = the symmetric-delete ("SymSpell") neighborhood: two
  * strings with Levenshtein distance ≤ d always share at least one common
  * member of their ≤ d-deletion neighborhoods (delete up to d characters
  * in every position combination; the original string is a member at
  * depth 0). So exploding each side into its deletion variants and
  * equi-joining on the variant yields a candidate set with ZERO recall
  * loss at ≤ d — the Levenshtein verification afterwards only removes
  * false positives. Candidate volume per row is O(len^d), independent of
  * corpus size: at 100 TB this is a plain hash equi-join on 8-byte keys
  * (variants are xxhash64'd before the shuffle — a hash collision can
  * only ADD a candidate, never drop one, and the verify step removes it),
  * vs the quadratic blow-up of a naive distance cross join. Same design
  * family as the minhash/simhash/phash banding joins (`Dedup.minhashPairs`,
  * `Multimodal.phashPairs`): pigeonhole-complete candidates + exact verify.
  *
  * Distance semantics: plain Levenshtein (insert/delete/substitute, unit
  * cost), counted over CODEPOINTS — both Spark's `levenshtein` and the
  * DuckDB oracle's agree on that; fold non-BMP/confusable text first
  * (the t05 precedent) if byte-level agreement is required. NULL keys on
  * either side never match (SQL comparison semantics); rows carrying them
  * are dropped from the join, not errored.
  *
  * Skew note: a pathologically hot variant key (e.g. the empty string at
  * depth ≥ len, or a very common short name) multiplies candidates.
  * `maxBucket` caps the RIGHT-side bucket size, mirroring
  * `Dedup.simhashPairs`: buckets above the cap are dropped from the
  * candidate generation, which TRADES RECALL for boundedness — the
  * default keeps every bucket, and droppers must opt in knowingly.
  */
object FuzzyJoin {

  /** Deletion neighborhood of a string column: all strings obtainable by
    * deleting up to `depth` characters (the string itself included),
    * de-duplicated. `array<string>`; NULL in → NULL out.
    *
    * Pure Column composition (stays inside whole-stage codegen). The
    * inner `sequence(0, len-1)` is guarded for empty strings — Spark's
    * `sequence(0, -1)` counts DOWN (the round-8 lesson), so the empty
    * string maps to just `[""]`.
    */
  def deleteVariants(s: Column, depth: Int): Column = {
    require(depth >= 0, s"deleteVariants depth must be >= 0, got $depth")
    def oneDelete(v: Column): Column =
      when(length(v) >= 1,
        transform(sequence(lit(0), length(v) - 1),
          i => concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v)))))
        .otherwise(array().cast("array<string>"))
    var acc = array(s)
    var d = 0
    while (d < depth) {
      acc = array_distinct(concat(acc, flatten(transform(acc, oneDelete(_)))))
      d += 1
    }
    acc
  }

  /** Blocked fuzzy equi-join: every (left, right) row pair whose key
    * strings are within Levenshtein distance `maxDist`, found via the
    * deletion-neighborhood blocking above (exhaustive at ≤ `maxDist`).
    *
    * Output columns: `<leftId>`, `<leftKey>`, `<rightId>`, `<rightKey>`,
    * `dist` (int). One row per distinct (id, key) pair combination —
    * duplicate (id, key) input rows collapse, which is what an entity
    * matcher wants (the verify is on values, not multiplicities).
    *
    * @param maxBucket drop variant buckets whose RIGHT side exceeds this
    *                  many rows — bounded-candidates guard that LOSES
    *                  recall on hot keys; default keeps everything.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, maxBucket: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 0, s"fuzzyJoin maxDist must be >= 0, got $maxDist")
    val lv = left.select(col(leftId).as("__lid"), col(leftKey).as("__lk"))
      .filter(col("__lk").isNotNull).distinct()
      .select(col("__lid"), col("__lk"),
        explode(deleteVariants(col("__lk"), maxDist)).as("__v"))
      .select(col("__lid"), col("__lk"), xxhash64(col("__v")).as("__h"))
      .distinct() // several deletion positions can yield one variant
    val rvAll = right.select(col(rightId).as("__rid"), col(rightKey).as("__rk"))
      .filter(col("__rk").isNotNull).distinct()
      .select(col("__rid"), col("__rk"),
        explode(deleteVariants(col("__rk"), maxDist)).as("__v"))
      .select(col("__rid"), col("__rk"), xxhash64(col("__v")).as("__h"))
      .distinct()
    val rv =
      if (maxBucket == Long.MaxValue) rvAll
      else {
        // hot-bucket guard: one aggregate on the 8-byte key, then a
        // broadcast-able semi filter (hot keys are few by definition)
        val hot = rvAll.groupBy("__h").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket).select("__h")
        rvAll.join(broadcast(hot), Seq("__h"), "left_anti")
      }
    lv.join(rv, Seq("__h"))
      .select(col("__lid"), col("__lk"), col("__rid"), col("__rk"))
      .distinct() // pairs sharing several variants collapse before verify
      .withColumn("dist", levenshtein(col("__lk"), col("__rk")))
      .filter(col("dist") <= maxDist)
      .select(col("__lid").as(leftId), col("__lk").as(leftKey),
        col("__rid").as(rightId), col("__rk").as(rightKey), col("dist"))
  }
}
