package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means clustering over an embedding column — corpus
  * clustering for mixture design, cluster-balanced sampling and
  * diversity analysis (the batch generalization of the coarse
  * quantizers the ANN family trains on driver-side samples).
  *
  * Deterministic by construction, which makes it cross-engine
  * verifiable (the s10 gate has DuckDB reproduce every iteration):
  *  - assignment scores are `‖c‖² − 2·x·c` with fixed expression shape
  *    (the x·x term is cluster-independent and skipped), dots via the
  *    left-to-right [[graft.functions.VecOps]] fold both engines share;
  *    ties break to the lowest cluster id;
  *  - centroid updates go through [[Similarity.meanPool]]'s quantized
  *    scaled-LONG sums, so means are independent of partitioning AND
  *    engine (raw-double DECIMAL casts are not cross-engine stable);
  *  - default init centroids are a deterministic hash-ordered k-row
  *    sample (no assumption on the id space); the s10 gate passes
  *    explicit strided-row centroids ([[Similarity.rawVectorsByIds]],
  *    un-normalized — k-means runs in the raw embedding space) so
  *    DuckDB derives the identical init from `count(*)`.
  *
  * Shape at 100 TB: per iteration the assignment is ONE narrow
  * codegen'd projection against broadcast literal centroids (no
  * shuffle, no join) and the update is ONE (cluster, idx, x_q) LONG
  * shuffle with map-side combine, followed by a k·dim-row driver
  * collect — the exact footprint of MLlib's Lloyd step expressed
  * relationally. k is bounded by expression size (thousands; beyond
  * that, pre-bucket with a coarse quantizer and run per-bucket).
  */
object Clustering {

  /** Nearest-centroid id (0-based) by squared L2 distance, ties to the
    * lowest id — a single codegen'd least-of-structs over broadcast
    * literal centroids; `‖c‖²` is precomputed on the driver with the
    * same left-to-right fold the kernel uses, so scores stay
    * bitwise-reproducible. */
  def assignCluster(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "assignCluster: no centroids")
    if (centroids.length == 1) lit(0)
    else least(centroids.zipWithIndex.map { case (c, j) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      val cl = typedlit(c.toSeq)
      struct((lit(cc) - lit(2.0) * Similarity.dot(vec, cl)).as("score"),
        lit(j).as("cluster"))
    }.toSeq: _*).getField("cluster")
  }

  /** Lloyd iterations with quantized-mean updates. Returns the final
    * per-row assignment `(id, cluster)` (computed against the LAST
    * updated centroids) and the centroids themselves. An empty cluster
    * keeps its previous centroid. `iters = 0` just assigns against the
    * init centroids.
    *
    * Default init: the k rows with the smallest `xxhash64(id, v)` — a
    * deterministic unbiased pseudo-random sample that compiles to a
    * per-partition top-k (no global sort) and assumes NOTHING about the
    * id space (hashing the vector too keeps the pick well-defined even
    * under duplicated ids). Pass `initCentroids` for
    * reproducible-by-construction inits (e.g. the s10 gate's strided
    * rows via [[Similarity.rawVectorsByIds]]).
    *
    * When any internal action will run (iterations, or the default
    * init sample), the projected input is checkpointed once up front
    * ([[Lineage.cut]]) — otherwise every Lloyd step would re-run the
    * caller's whole upstream pipeline. Executor-local by default
    * (executor loss fails the job); reliable when a SparkContext
    * checkpoint dir is set. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, initCentroids: Option[Array[Array[Double]]] = None,
      quantScale: Int = 8): (DataFrame, Array[Array[Double]]) = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be >= 0")
    val projected = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val data =
      if (iters > 0 || initCentroids.isEmpty) Lineage.cut(projected)
      else projected
    var cents = initCentroids.getOrElse {
      val sample = data.orderBy(xxhash64(col("id"), col("v"))).limit(k)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      require(sample.length == k, s"k=$k exceeds corpus size ${sample.length}")
      sample
    }
    require(cents.length == k, s"init centroids ${cents.length} != k=$k")
    var it = 0
    while (it < iters) {
      val assigned = data.withColumn("cluster", assignCluster(col("v"), cents))
      val means = Similarity.meanPool(assigned, "cluster", "v", quantScale)
        .select(col("group_id"), col("mean_vec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      cents = Array.tabulate(k)(j => means.getOrElse(j, cents(j)))
      it += 1
    }
    (data.select(col("id"), assignCluster(col("v"), cents).as("cluster")), cents)
  }
}
