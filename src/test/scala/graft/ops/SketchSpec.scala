package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct-count sketch: exactness below k, estimator accuracy
  * above it, order/partitioning invariance, and mergeability. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("below k the sketch is exact and the estimate equals the true count") {
    val df = (0 until 500).map(i => ("k" + (i % 3), "v" + (i % 40))).toDF("key", "v")
    val sk = Sketch.kmvSketch(df, "key", "v", k = 64)
    val est = Sketch.kmvEstimate(sk, 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each key sees a subset of the 40 distinct values
    val truth = df.groupBy("key").agg(countDistinct(col("v")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (key, n) =>
      assert(est(key) == ((n, n)), s"$key: expected exact ($n,$n), got ${est(key)}")
    }
  }

  test("above k the estimate lands within the KMV error band") {
    val df = (0 until 60000).map(i => ("g" + (i % 2), "tok" + (i % 10000)))
      .toDF("key", "v")
    val k = 256
    val est = Sketch.kmvEstimate(Sketch.kmvSketch(df, "key", "v", k), k).collect()
    est.foreach { r =>
      val e = r.getLong(2)
      assert(r.getLong(1) == k)
      // true distinct per key = 5000; 1/sqrt(k-2) ~ 6.3%, allow 4 sigma
      assert(math.abs(e - 5000.0) / 5000.0 <= 0.25,
        s"${r.getString(0)}: estimate $e too far from 5000")
    }
  }

  test("sketch is invariant to row order and partitioning") {
    val rows = (0 until 20000).map(i => ("a", "v" + (i * 2654435761L % 7000)))
    val a = Sketch.kmvSketch(rows.toDF("key", "v").repartition(1), "key", "v", 64)
      .head().getSeq[Long](1)
    val b = Sketch.kmvSketch(
      scala.util.Random.shuffle(rows).toDF("key", "v").repartition(13), "key", "v", 64)
      .head().getSeq[Long](1)
    assert(a == b)
    assert(a == a.sorted && a.distinct == a, "sketch must be ascending and distinct")
  }

  test("merging day-sketches equals sketching the union") {
    val day1 = (0 until 8000).map(i => ("k", "d1-" + (i % 3000)))
    val day2 = (0 until 8000).map(i => ("k", "d2-" + (i % 2500)))
    val shared = (0 until 1000).map(i => ("k", "d1-" + i)) // overlap with day1
    val k = 128
    val s1 = Sketch.kmvSketch(day1.toDF("key", "v"), "key", "v", k)
    val s2 = Sketch.kmvSketch((day2 ++ shared).toDF("key", "v"), "key", "v", k)
    val merged = Sketch.kmvMerge(s1.unionByName(s2), k).head().getSeq[Long](1)
    val direct = Sketch.kmvSketch((day1 ++ day2 ++ shared).toDF("key", "v"),
      "key", "v", k).head().getSeq[Long](1)
    assert(merged == direct, "merge must equal the union sketch exactly")
  }

  test("null values are ignored; k < 2 rejected") {
    val df = Seq(("k", "a"), ("k", null), ("k", "b")).toDF("key", "v")
    val est = Sketch.kmvEstimate(Sketch.kmvSketch(df, "key", "v", 8), 8).head()
    assert(est.getLong(1) == 2L && est.getLong(2) == 2L)
    intercept[IllegalArgumentException](Sketch.kmvAgg(lit(1L), 1))
  }
}
