package graft.ops

import graft.SparkSpec

/** [[FsOps.healSwaps]]'s completeness gating (round-12 review finding):
  * a PARTIAL `.building` sibling left by a crashed write must never be
  * resurrected over a complete `.compacting` copy — only siblings whose
  * root holds Spark's `_SUCCESS` job-commit marker are heal candidates,
  * newest marker wins. */
class FsOpsSpec extends SparkSpec {

  import java.nio.file.{Files, Paths}

  private def mkData(dir: String, marker: Boolean, tag: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, s"part-$tag.parquet"), tag)
    if (marker) Files.writeString(Paths.get(dir, "_SUCCESS"), "")
  }

  test("a partial .building (no _SUCCESS) never shadows a complete .compacting") {
    val base = tmpDir("fsops-heal").resolve("idx").toString
    mkData(base + ".building", marker = false, "partial")
    mkData(base + ".compacting", marker = true, "complete")
    FsOps.healSwaps(spark, base)
    assert(Files.exists(Paths.get(base, "part-complete.parquet")),
      "the complete sibling must be healed into place")
    assert(Files.exists(Paths.get(base + ".building")),
      "the partial sibling is left for inspection, never deleted")
  }

  test("both siblings complete: the newest _SUCCESS wins; loser left on disk") {
    val base = tmpDir("fsops-heal2").resolve("idx").toString
    mkData(base + ".compacting", marker = true, "old")
    Thread.sleep(1100) // distinct _SUCCESS mtimes at 1s filesystem resolution
    mkData(base + ".building", marker = true, "new")
    FsOps.healSwaps(spark, base)
    assert(Files.exists(Paths.get(base, "part-new.parquet")),
      "the newer complete sibling must win")
    assert(Files.exists(Paths.get(base + ".compacting")))
  }

  test("no-op when the destination exists or no complete sibling exists") {
    val base = tmpDir("fsops-heal3").resolve("idx").toString
    mkData(base, marker = true, "live")
    mkData(base + ".building", marker = true, "stale")
    FsOps.healSwaps(spark, base)
    assert(Files.exists(Paths.get(base, "part-live.parquet")))
    assert(Files.exists(Paths.get(base + ".building")), "dst exists: untouched")
    val base2 = tmpDir("fsops-heal4").resolve("idx").toString
    mkData(base2 + ".building", marker = false, "partial")
    FsOps.healSwaps(spark, base2)
    assert(!Files.exists(Paths.get(base2)),
      "a partial-only sibling must not be promoted")
  }
}
