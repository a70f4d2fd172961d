package graft.queries

import graft.SparkSpec

/** Cross-engine threshold-margin guard for the e22 streaming embedding
  * screen (and its s18 sibling's rerank): Spark scores candidates with the
  * left-to-right VecOps dot kernel while the DuckDB oracle uses
  * `list_cosine_similarity` — a DIFFERENT summation order, identical only
  * while no compared cosine sits within float-noise of the 0.95 admission
  * threshold. The driver regenerates /root/testdata between rounds
  * (round-5 precedent), so the margin must be ASSERTED, not assumed: if a
  * regen ever drops an organic pair into the (0.94, 0.96) band, this spec
  * fails loudly instead of the gate flaking on last-ulp divergence.
  *
  * Scope: the all-pairs cosine set over every direction the e22 fixture
  * feeds or indexes (ids < 150 indexed, 350–369 + 450–469 organic feed
  * rows; scaled copies normalize onto their base's direction) is a
  * superset of every cosine either engine ever compares against the
  * threshold, so margin here implies margin on all compared pairs. */
class E22MarginSpec extends SparkSpec {

  test("no e22 fixture pair lands within 0.01 of the 0.95 threshold (any SF)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")
         if new java.io.File(s"/root/testdata/$sf/embeddings.parquet").exists()) {
      val rows = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .filter("vec_id < 150 OR (vec_id >= 350 AND vec_id < 370)" +
          " OR (vec_id >= 450 AND vec_id < 470)")
        .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      assert(rows.length == 190, s"$sf: fixture ids missing (${rows.length})")
      def unit(v: Array[Double]): Array[Double] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
      val vs = rows.map { case (id, v) => id -> unit(v) }
      val offenders = for {
        i <- vs.indices
        j <- (i + 1) until vs.length
        c = vs(i)._2.zip(vs(j)._2).map { case (a, b) => a * b }.sum
        if c > 0.94 && c < 0.96
      } yield (vs(i)._1, vs(j)._1, c)
      assert(offenders.isEmpty,
        s"$sf: fixture pairs inside the cross-engine danger band around " +
          s"0.95 — regen eroded the margin, re-cut the e22 fixture: " +
          offenders.take(5).mkString(", "))
    }
  }
}
