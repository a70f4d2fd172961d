package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (the classic 100 TB failure: one hot key lands one task with
  * hours of work while 999 executors idle).
  *
  * Spark's AQE skew-join handles sort-merge skew automatically when
  * statistics expose it; explicit salting remains necessary when the
  * skewed side must hash-join, or the hot keys are known a priori.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a random salt in
    * [0, saltFactor); the small side is replicated `saltFactor`× with
    * every salt value; the join key becomes (key, salt), splitting each
    * hot key across `saltFactor` tasks.
    *
    * Deterministic variant: salt is derived from a hash of the whole big
    * row (`xxhash64` over all columns), not `rand()`, so results are
    * reproducible run-to-run.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched small-side row once per
    // salt replica — only join types that preserve the big side are sound
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(c => col(s"`$c`")).toSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop(replicated(key)).drop(salted("__salt")).drop(replicated("__salt"))
  }

  /** Top-N key frequencies for a column — cheap skew diagnosis before
    * choosing a strategy (broadcast, salt, or AQE default). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)
}
