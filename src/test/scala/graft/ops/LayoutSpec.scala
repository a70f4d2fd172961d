package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked values)") {
    // a=0b101 (bits at 1,3,5 doubled+1), b=0b011
    // z = sum: a bits {0,2} -> positions 1,5 ; b bits {0,1} -> positions 0,2
    // a=5 (101): bits 0,2 -> 2^1 + 2^5 = 34; b=3 (011): bits 0,1 -> 2^0 + 2^2 = 5
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z")).head().getLong(0)
    assert(z == 39L)
    // zero/zero and max-16-bit corners
    val corners = Seq((0L, 0L), (65535L, 65535L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z")).collect().map(_.getLong(0))
    assert(corners(0) == 0L && corners(1) == (1L << 32) - 1)
  }

  test("z-ordered layout prunes 2-D box queries where a 1-D sort cannot") {
    // 64x64 grid of (x, y) keys, written 16 ways under both layouts
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zPath = tmpDir("layout-z").resolve("t").toString
    val xPath = tmpDir("layout-x").resolve("t").toString
    Layout.zorderWrite(grid, col("x"), col("y"), zPath, numFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xPath)

    def candidates(path: String): Long = {
      val ranges = Layout.fileRanges(spark.read.parquet(path), "x", "y")
      // box: x in [0,15], y in [0,15] — a 1/16th-area corner query
      ranges.filter(col("a_min") <= 15 && col("a_max") >= 0 &&
        col("b_min") <= 15 && col("b_max") >= 0).count()
    }
    val zCand = candidates(zPath)
    val xCand = candidates(xPath)
    // x-sorted files each span ALL y values: every file whose x range
    // touches [0,15] is a candidate ONLY via x — but the box constrains
    // y too, which x-sorting cannot exploit. Z-order keeps both ranges
    // tight: the corner box must hit strictly fewer files.
    assert(zCand < xCand || (zCand <= 2 && xCand >= zCand),
      s"z-order candidates $zCand should undercut x-sort candidates $xCand")
    assert(zCand <= 4, s"corner box should touch at most a quadrant's files, got $zCand")
    // and the layout is lossless
    assert(spark.read.parquet(zPath).count() == 64L * 64L)
  }

  test("zorderWritePlanned: sketch-derived boundaries give deterministic, disjoint, balanced files") {
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    // one corpus pass builds the z-value sketch; boundaries derive from
    // bucket rows — every later write plans from them without sampling
    val zs = grid.select(lit("_").as("k"),
      Layout.zValue(col("x"), col("y"), 6).as("z"))
    val sketch = Sketch.histSketch(zs, "k", "z", subBits = 5)
    val bounds = Sketch.histBoundaries(sketch, subBits = 5, k = 16)
    assert(bounds.size == 15 && bounds == bounds.sorted)
    val p1 = tmpDir("layout-plan1").resolve("t").toString
    val p2 = tmpDir("layout-plan2").resolve("t").toString
    Layout.zorderWritePlanned(grid, col("x"), col("y"), p1, bounds, bits = 6)
    Layout.zorderWritePlanned(grid, col("x"), col("y"), p2, bounds, bits = 6)
    // lossless, and exactly k non-empty files (boundaries from the data)
    assert(spark.read.parquet(p1).count() == 64L * 64L)
    def zRanges(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(Layout.zValue(col("x"), col("y"), 6)).as("zmin"),
          max(Layout.zValue(col("x"), col("y"), 6)).as("zmax"),
          count(lit(1)).as("rows"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    val r1 = zRanges(p1)
    assert(r1.size == 16, s"expected 16 files, got ${r1.size}")
    // files cover DISJOINT contiguous z ranges (the pruning contract)
    for (Seq((_, hi, _), (lo2, _, _)) <- r1.toSeq.sliding(2))
      assert(hi < lo2, s"overlapping file z ranges: $r1")
    // deterministic: the second write has identical per-file ranges/rows
    assert(zRanges(p2).toSeq == r1.toSeq, "same boundaries must give the same layout")
    // balance inherits the sketch bound — uniform grid lands near 256/file
    val rows = r1.map(_._3)
    assert(rows.max <= 2 * rows.min,
      s"planned files should be balanced on uniform data: ${rows.toSeq}")
    // pruning parity with the sampled writer on the corner box
    assert(cornerCandidates(p1) <= 4)
    // null z (null keys) lands in range 0, lossless
    val withNull = grid.unionByName(Seq((null.asInstanceOf[java.lang.Long], 1L))
      .toDF("x", "y").select(col("x").cast("long").as("x"), col("y")))
    val p3 = tmpDir("layout-plan3").resolve("t").toString
    Layout.zorderWritePlanned(withNull, col("x"), col("y"), p3, bounds, bits = 6)
    assert(spark.read.parquet(p3).count() == 64L * 64L + 1)
  }

  test("hashBijection: residues are a bijection and match Spark's partitioner placement") {
    for (k <- Seq(2, 7, 16, 61)) {
      val remap = Layout.hashBijection(spark, k)
      assert(remap.size == k)
      val placed = remap.toDF("v")
        .select(pmod(hash(col("v")), lit(k)).as("r"))
        .collect().map(_.getInt(0)).toSeq
      assert(placed == (0 until k), s"k=$k: $placed")
    }
  }

  private def cornerCandidates(path: String): Long =
    Layout.fileRanges(spark.read.parquet(path), "x", "y")
      .filter(col("a_min") <= 15 && col("a_max") >= 0 &&
        col("b_min") <= 15 && col("b_max") >= 0).count()

  test("appendZorder + compactZorder restores fresh-write pruning quality") {
    // exact range quantiles for this comparison: boundary placement is
    // otherwise sampling-approximate (default 100 points/partition),
    // which moves candidate counts by ±2 for fresh AND compacted writes
    // alike — noise, not layout quality
    spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "100000")
    try testCompactQuality()
    finally spark.conf.unset("spark.sql.execution.rangeExchange.sampleSizePerPartition")
  }

  private def testCompactQuality(): Unit = {
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    // split the grid into a base (3/4) and three append batches (1/4)
    val base = grid.filter(col("id") % 4 =!= 0)
      .select("x", "y") // keep id out of the layout table
    val freshPath = tmpDir("layout-fresh").resolve("t").toString
    val lifePath = tmpDir("layout-life").resolve("t").toString
    Layout.zorderWrite(grid.select("x", "y"), col("x"), col("y"), freshPath,
      numFiles = 16, bits = 6)
    Layout.zorderWrite(base, col("x"), col("y"), lifePath, numFiles = 16, bits = 6)
    for (k <- Seq(0, 4, 8)) // three whole-key-space batches
      Layout.appendZorder(grid.filter(col("id") % 4 === 0 && col("id") % 12 === k)
        .select("x", "y"), col("x"), col("y"), lifePath, numFiles = 2, bits = 6)
    // appended files span wide z ranges: pruning has degraded
    assert(spark.read.parquet(lifePath).count() == 64L * 64L)
    val degraded = cornerCandidates(lifePath)
    val rewritten = Layout.compactZorder(spark, lifePath, col("x"), col("y"),
      numFiles = 16, bits = 6)
    assert(rewritten > 0, "whole-space appends must dirty at least one group")
    // lossless, and corner-box pruning back to fresh-write quality
    assert(spark.read.parquet(lifePath).count() == 64L * 64L)
    val compacted = cornerCandidates(lifePath)
    val fresh = cornerCandidates(freshPath)
    assert(compacted <= fresh + 1,
      s"compacted candidates $compacted should match fresh write $fresh (degraded: $degraded)")
    assert(compacted <= degraded, "compaction must not worsen pruning")
    // a second compact is a no-op: the table is already disjoint
    assert(Layout.compactZorder(spark, lifePath, col("x"), col("y"), 16, bits = 6) == 0)
  }

  test("compactZorder re-clusters only overlapping groups; disjoint files are byte-carried") {
    // two well-separated key clusters -> disjoint z regions
    val lo = spark.range(512).select((col("id") % 16).as("x"), (col("id") / 32).as("y"))
    val hi = lo.select((col("x") + 48).as("x"), (col("y") + 48).as("y"))
    val path = tmpDir("layout-sel").resolve("t").toString
    Layout.zorderWrite(lo.unionByName(hi), col("x"), col("y"), path,
      numFiles = 4, bits = 6)
    def files(): Set[String] =
      Layout.fileRanges(spark.read.parquet(path), "x", "y")
        .select("file").collect().map(_.getString(0)
          .replaceAll(".*/", "")).toSet
    val before = files()
    // append a batch INSIDE the low cluster's key region only
    Layout.appendZorder(lo.limit(64), col("x"), col("y"), path, numFiles = 1, bits = 6)
    Layout.compactZorder(spark, path, col("x"), col("y"), numFiles = 4, bits = 6)
    assert(spark.read.parquet(path).count() == 512 + 512 + 64)
    val after = files()
    // the high cluster's files were disjoint from the appended z range:
    // their exact part files must survive compaction (byte copy, not
    // rewrite), while at least one low-cluster file was re-clustered
    assert(before.intersect(after).nonEmpty,
      s"expected some untouched files to be byte-carried: before=$before after=$after")
    assert(after.diff(before).nonEmpty, "expected the dirty group to produce new files")
  }

  test("compactZorder tolerates null-keyed rows (null z groups first, stays lossless)") {
    val grid = spark.range(256)
      .select(when(col("id") % 32 === 0, lit(null)).otherwise(col("id") % 16).as("x"),
        (col("id") / 16).cast("long").as("y"))
    val path = tmpDir("layout-null").resolve("t").toString
    Layout.zorderWrite(grid, col("x"), col("y"), path, numFiles = 2, bits = 4)
    // an ALL-null-key batch: its file's min/max z stats are empty
    Layout.appendZorder(
      spark.range(16).select(lit(null).cast("long").as("x"), lit(null).cast("long").as("y")),
      col("x"), col("y"), path, numFiles = 1, bits = 4)
    Layout.compactZorder(spark, path, col("x"), col("y"), numFiles = 4, bits = 4)
    assert(spark.read.parquet(path).count() == 256 + 16)
    assert(spark.read.parquet(path).filter(col("x").isNull).count() == 8 + 16)
  }

  test("healZorder recovers the delete-rename crash window") {
    val grid = spark.range(256).select((col("id") % 16).as("x"), (col("id") / 16).as("y"))
    val dir = tmpDir("layout-heal")
    val path = dir.resolve("t").toString
    Layout.zorderWrite(grid, col("x"), col("y"), path, numFiles = 2, bits = 4)
    // simulate the crash: complete new copy at .compacting, dst deleted
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".compacting"))
    Layout.healZorder(spark, path)
    assert(spark.read.parquet(path).count() == 256)
    // heal is a no-op on an intact table
    Layout.healZorder(spark, path)
    assert(spark.read.parquet(path).count() == 256)
  }
}
