package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "v")

  test("kmeans: two obvious blobs separate; centroids are quantized means") {
    val df = vecs(
      1L -> Seq(0.0, 0.1), 2L -> Seq(0.1, 0.0), 3L -> Seq(0.05, 0.05),
      4L -> Seq(10.0, 10.1), 5L -> Seq(10.1, 10.0), 6L -> Seq(9.95, 10.05))
    val (assign, cents) = Clustering.kmeans(df, "id", "v", k = 2, iters = 3,
      initCentroids = Some(Array(Array(0.0, 0.0), Array(9.0, 9.0))))
    val a = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(a(_) == 0) && Seq(4L, 5L, 6L).forall(a(_) == 1))
    // quantized mean of blob 0: sum(round(x*1e8)) / (3 * 1e8)
    val exp0 = (math.round(0.0 * 1e8) + math.round(0.1 * 1e8) + math.round(0.05 * 1e8)).toDouble / (3.0 * 1e8)
    assert(cents(0)(0) == exp0)
  }

  test("kmeans: deterministic under repartitioning") {
    val base = (0L until 300L).map(i =>
      (i, Seq((i % 7).toDouble, (i % 11).toDouble, (i % 3).toDouble)))
    def run(parts: Int) = {
      val (assign, cents) = Clustering.kmeans(
        base.toDF("id", "v").repartition(parts), "id", "v", k = 5, iters = 4)
      (assign.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq,
        cents.map(_.toSeq).toSeq)
    }
    assert(run(1) == run(13))
  }

  test("kmeans: empty cluster keeps its init centroid; iters=0 assigns only") {
    val df = vecs(1L -> Seq(0.0), 2L -> Seq(0.2), 3L -> Seq(0.1))
    val far = Array(Array(0.0), Array(1000.0))
    val (_, cents) = Clustering.kmeans(df, "id", "v", k = 2, iters = 2,
      initCentroids = Some(far))
    assert(cents(1).toSeq == Seq(1000.0)) // captured nothing, unchanged
    val (a0, c0) = Clustering.kmeans(df, "id", "v", k = 2, iters = 0,
      initCentroids = Some(far))
    assert(c0.map(_.toSeq).toSeq == far.map(_.toSeq).toSeq)
    assert(a0.collect().map(_.getInt(1)).forall(_ == 0))
  }

  test("kmeans: default hash-sample init works on sparse, non-contiguous ids") {
    val df = (1L to 20L).map(i => (i * 1000003L + 17L, Seq((i % 4).toDouble)))
      .toDF("id", "v")
    val (assign, cents) = Clustering.kmeans(df, "id", "v", k = 3, iters = 2)
    assert(assign.count() == 20 && cents.length == 3)
    assert(assign.select("cluster").distinct().count() > 1)
  }

  test("assignCluster: equidistant tie breaks to the lowest cluster id") {
    val df = vecs(1L -> Seq(0.5))
    val c = df.select(Clustering.assignCluster(col("v"),
      Array(Array(0.0), Array(1.0))).as("c")).head().getInt(0)
    assert(c == 0)
  }

  test("kmeans assignment plan: no shuffle, no join — broadcast-literal projection") {
    val df = vecs(1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 1.0))
    val plan = df.select(Clustering.assignCluster(col("v"),
        Array(Array(0.0, 0.0), Array(1.0, 1.0))).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
  }
}
