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

  test("count-min: exact without collisions, never undercounts with them") {
    val rows = (0 until 10000).map(i => ("k", "v" + (i % 50)))
    val df = rows.toDF("key", "v")
    val probes = (0 until 50).map(i => ("k", "v" + i)).toDF("key", "value")
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // wide sketch: 50 values over 4×4096 buckets — collisions absent
    val wide = Sketch.cmEstimate(Sketch.cmSketch(df, "key", "v", 4, 4096),
      probes, "key", "value", 4, 4096).collect()
    wide.foreach(r => assert(r.getLong(2) == truth(r.getString(1)),
      s"${r.getString(1)}: ${r.getLong(2)} != ${truth(r.getString(1))}"))
    // narrow sketch: collisions guaranteed — estimates may inflate but
    // can NEVER undercount
    val narrow = Sketch.cmEstimate(Sketch.cmSketch(df, "key", "v", 2, 16),
      probes, "key", "value", 2, 16).collect()
    narrow.foreach(r => assert(r.getLong(2) >= truth(r.getString(1))))
    // an absent value probes to 0 in the wide sketch
    val absent = Sketch.cmEstimate(Sketch.cmSketch(df, "key", "v", 4, 4096),
      Seq(("k", "nope")).toDF("key", "value"), "key", "value", 4, 4096).head()
    assert(absent.getLong(2) == 0L)
  }

  test("count-min: merge equals the union sketch; weighted counts sum weights") {
    val d1 = (0 until 3000).map(i => ("k", "a" + (i % 20))).toDF("key", "v")
    val d2 = (0 until 2000).map(i => ("k", "a" + (i % 35))).toDF("key", "v")
    val merged = Sketch.cmMerge(
      Sketch.cmSketch(d1, "key", "v", 3, 256).unionByName(
        Sketch.cmSketch(d2, "key", "v", 3, 256)))
      .orderBy("di", "bucket").collect().map(_.toSeq)
    val direct = Sketch.cmSketch(d1.unionByName(d2), "key", "v", 3, 256)
      .orderBy("di", "bucket").collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq)
    // weighted: each value's estimate is the SUM of its weights
    val wdf = Seq(("k", "x", 5L), ("k", "x", 7L), ("k", "y", 2L)).toDF("key", "v", "w")
    val west = Sketch.cmEstimate(
      Sketch.cmSketch(wdf, "key", "v", 4, 1024, weightCol = Some("w")),
      Seq(("k", "x"), ("k", "y")).toDF("key", "value"), "key", "value", 4, 1024)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(west == Map("x" -> 12L, "y" -> 2L))
  }

  test("bloom: no false negatives ever; absent values mostly definitely-absent; merge ORs") {
    val present = (0 until 400).map(i => ("k", "in" + i))
    val df = present.toDF("key", "v")
    val sk = Sketch.bloomSketch(df, "key", "v", numBits = 8192, numHashes = 4)
    // every inserted value MUST probe maybe-present (the bloom guarantee)
    val inProbe = Sketch.bloomMayContain(sk, present.toDF("key", "value"),
      "key", "value", 8192, 4).collect()
    assert(inProbe.forall(_.getBoolean(2)), "false negative — bloom contract broken")
    // absent values: deterministic hash → stable false-positive count;
    // 400 values at 8192 bits / 4 hashes gives fp ≈ (1-e^-0.195)^4 ≈ 0.1%
    val absent = (0 until 500).map(i => ("k", "out" + i)).toDF("key", "value")
    val fp = Sketch.bloomMayContain(sk, absent, "key", "value", 8192, 4)
      .filter(col("may_contain")).count()
    assert(fp <= 10, s"false-positive rate too high: $fp/500")
    // merging day-filters equals filtering the union
    val d1 = present.take(200).toDF("key", "v")
    val d2 = present.drop(150).toDF("key", "v") // overlap
    val merged = Sketch.bloomMerge(
      Sketch.bloomSketch(d1, "key", "v", 8192, 4).unionByName(
        Sketch.bloomSketch(d2, "key", "v", 8192, 4)))
      .orderBy("word_idx").collect().map(_.toSeq)
    val direct = sk.orderBy("word_idx").collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq)
  }

  test("heavyHitters: exact results equal the naive aggregation; prescreen is semi-join-shaped") {
    // zipf-ish: value j occurs ~N/j times -> few heavy, long tail
    val rows = (1 to 60).flatMap(j => Seq.fill(600 / j)(("k" + (j % 2), "v" + j)))
    val df = rows.toDF("key", "v")
    for (min <- Seq(30L, 100L, 400L); width <- Seq(16, 1024)) {
      val got = Sketch.heavyHitters(df, "key", "v", min, depth = 3, width = width)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val naive = df.groupBy("key", "v").count().filter(col("count") >= min)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == naive, s"min=$min width=$width: $got != $naive")
    }
    // the prescreen plans as broadcast semi-joins (map-side), never a
    // value-keyed shuffle before the final pruned aggregation —
    // inspected via the private plan-only variant, since the public API
    // eagerly materializes and truncates its plan
    val plan = Sketch.heavyHittersPlanOnly(df, "key", "v", 100L, 3, 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastHashJoin"), plan.take(2000))
    // null-key groups survive exactly like the naive aggregation
    val withNulls = df.unionByName(
      Seq.fill(150)((null.asInstanceOf[String], "vn")).toDF("key", "v"))
    val gotN = Sketch.heavyHitters(withNulls, "key", "v", 100L, 3, 1024)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val naiveN = withNulls.groupBy("key", "v").count().filter(col("count") >= 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(gotN == naiveN && gotN.exists(_._1 == null),
      s"null-key heavy hitter must survive: $gotN")
    // an over-large candidate set falls back to the naive plan, same result
    val fb = Sketch.heavyHitters(df, "key", "v", 100L, 3, 1024, broadcastRowLimit = 0L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fb == Sketch.heavyHitters(df, "key", "v", 100L, 3, 1024)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
    // the decision comparator itself (result equality cannot tell the
    // two paths apart by contract)
    assert(!Sketch.prescreenPaysOff(5L, 0L) && Sketch.prescreenPaysOff(5L, 10L)
      && Sketch.prescreenPaysOff(10L, 10L))
  }

  test("cm/bloom probes find null-KEY groups (null-safe joins)") {
    val nk = (Seq.fill(40)((null.asInstanceOf[String], "x")) ++
      Seq.fill(7)(("k", "x"))).toDF("key", "v")
    val est = Sketch.cmEstimate(Sketch.cmSketch(nk, "key", "v", 3, 512),
      Seq((null.asInstanceOf[String], "x"), ("k", "x")).toDF("key", "value"),
      "key", "value", 3, 512)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(est == Map(None -> 40L, Some("k") -> 7L))
    val mc = Sketch.bloomMayContain(Sketch.bloomSketch(nk, "key", "v", 1024, 3),
      Seq((null.asInstanceOf[String], "x"), (null.asInstanceOf[String], "nope"))
        .toDF("key", "value"), "key", "value", 1024, 3)
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(mc("x"), "null-key inserted value must probe maybe-present")
  }

  test("persisted bloom index: write/append/probe/compact lifecycle + heal") {
    val day1 = (0 until 300).map(i => ("k", "d1-" + i)).toDF("key", "v")
    val day2 = (0 until 300).map(i => ("k", "d2-" + i)).toDF("key", "v")
    val dir = tmpDir("bloom-idx")
    val path = dir.resolve("idx").toString
    Sketch.writeBloomIndex(day1, "key", "v", path, numBits = 8192, numHashes = 4)
    assert(Sketch.readBloomMeta(spark, path) == ((8192, 4)))
    Sketch.appendToBloomIndex(day2, "key", "v", path)
    // multi-segment probes ≡ a fresh sketch of the union
    val probes = ((0 until 50).map(i => ("k", "d1-" + i)) ++
      (0 until 50).map(i => ("k", "d2-" + i)) ++
      (0 until 50).map(i => ("k", "none-" + i))).toDF("key", "value")
    def probeMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    val viaIndex = probeMap(Sketch.probeBloomIndex(spark, path, probes, "key", "value"))
    val fresh = probeMap(Sketch.bloomMayContain(
      Sketch.bloomSketch(day1.unionByName(day2), "key", "v", 8192, 4),
      probes, "key", "value", 8192, 4))
    assert(viaIndex == fresh)
    assert((0 until 50).forall(i => viaIndex("d1-" + i) && viaIndex("d2-" + i)),
      "no false negatives across segments")
    // compaction: one row per (key, word_idx), probes unchanged
    Sketch.compactBloomIndex(spark, path)
    val rows = spark.read.parquet(path)
    assert(rows.groupBy("key", "word_idx").count().filter(col("count") > 1).isEmpty)
    assert(probeMap(Sketch.probeBloomIndex(spark, path, probes, "key", "value")) == viaIndex)
    // heal: recover the delete→rename crash window at the next read
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".building"))
    assert(probeMap(Sketch.probeBloomIndex(spark, path, probes, "key", "value")) == viaIndex)
  }

  test("null values are ignored; k < 2 rejected") {
    val df = Seq(("k", "a"), ("k", null), ("k", "b")).toDF("key", "v")
    val est = Sketch.kmvEstimate(Sketch.kmvSketch(df, "key", "v", 8), 8).head()
    assert(est.getLong(1) == 2L && est.getLong(2) == 2L)
    intercept[IllegalArgumentException](Sketch.kmvAgg(lit(1L), 1))
  }
}
