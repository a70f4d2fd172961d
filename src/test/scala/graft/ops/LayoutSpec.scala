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
}
