package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FuzzyJoin (deletion-neighborhood blocked join) and Funnel
  * (conversion funnels + retention cohorts). */
class FuzzyJoinFunnelSpec extends SparkSpec {
  import spark.implicits._

  /** plain reference Levenshtein (classic DP) for recall checks. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("deleteVariants: membership, empty string, depth 0 and 2") {
    def variants(s: String, d: Int): Set[String] =
      Seq(s).toDF("s").select(FuzzyJoin.deleteVariants(col("s"), d).as("v"))
        .as[Seq[String]].head().toSet
    assert(variants("abc", 0) === Set("abc"))
    assert(variants("abc", 1) === Set("abc", "bc", "ac", "ab"))
    // depth 2 adds every single character
    assert(variants("abc", 2) === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // empty string: guarded sequence — no counting-down blowup
    assert(variants("", 1) === Set(""))
    assert(variants("", 2) === Set(""))
  }

  test("fuzzyJoin recall is exhaustive at maxDist 1 and 2 vs brute force") {
    val words = Seq("small ring", "smal ring", "small rings", "small king",
      "red widget", "rd widget", "red gadget", "blue bolt", "blu blot",
      "hot gear", "hot year", "hotgear", "plate", "plates", "late",
      "aa", "ab", "ba", "", "x")
    val left = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val right = words.zipWithIndex.map { case (w, i) => (1000L + i, w) }
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.fuzzyJoin(
          left.toDF("lid", "lk"), right.toDF("rid", "rk"),
          "lid", "lk", "rid", "rk", maxDist = d)
        .select("lid", "rid", "dist")
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (lw, li) <- words.zipWithIndex
        (rw, ri) <- words.zipWithIndex
        dist = lev(lw, rw) if dist <= d
      } yield (li.toLong, 1000L + ri, dist)).toSet
      assert(got === want, s"maxDist=$d")
    }
  }

  test("fuzzyJoin drops null keys, collapses duplicate rows, caps hot buckets") {
    val left = Seq((1L, "abc"), (2L, null), (3L, "abc"), (3L, "abc")).toDF("lid", "lk")
    val right = Seq((10L, "abd"), (11L, null)).toDF("rid", "rk")
    val out = FuzzyJoin.fuzzyJoin(left, right, "lid", "lk", "rid", "rk", 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // null keys never match; (3,"abc") duplicated in input appears once
    assert(out === Set((1L, 10L), (3L, 10L)))

    // hot-bucket cap: 5 identical right names exceed maxBucket=3 on every
    // shared variant key — documented recall loss, result empty
    val hot = (1 to 5).map(i => (i.toLong, "same name")).toDF("rid", "rk")
    val probe = Seq((0L, "same name")).toDF("lid", "lk")
    assert(FuzzyJoin.fuzzyJoin(probe, hot, "lid", "lk", "rid", "rk", 1,
      maxBucket = 3L).isEmpty)
    assert(FuzzyJoin.fuzzyJoin(probe, hot, "lid", "lk", "rid", "rk", 1)
      .count() === 5L)
  }

  test("fuzzy index lifecycle: probe ≡ direct join, depth contract, append, compact") {
    val path = tmpDir("fuzzy-idx-spec").resolve("idx").toString
    val words = Seq("small ring", "red widget", "blue bolt", "hot gear")
    val catalog = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("clean_id", "name")
    FuzzyJoin.writeFuzzyIndex(catalog, "clean_id", "name", depth = 2, path)

    val batch = Seq((100L, "smal ring"), (101L, "rd wdget"), (102L, "novel thing"))
      .toDF("bid", "bname")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("bid", "entity_id", "dist").as[(Long, Long, Int)].collect().toSet
    val probed = pairs(FuzzyJoin.probeFuzzyIndex(spark, path, batch, "bid", "bname", 2))
    val direct = FuzzyJoin.fuzzyJoin(batch, catalog, "bid", "bname", "clean_id", "name", 2)
      .select(col("bid"), col("clean_id").as("entity_id"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === direct)
    assert(probed === Set((100L, 0L, 1), (101L, 1L, 2)))

    // probing deeper than the stored depth is a typed error
    val err = intercept[IllegalArgumentException] {
      FuzzyJoin.probeFuzzyIndex(spark, path, batch, "bid", "bname", 3)
    }
    assert(err.getMessage.contains("build depth"))

    // admit the novel, re-probe: a typo of it now matches; compaction
    // (after a duplicate re-append) serves the identical answer
    FuzzyJoin.appendToFuzzyIndex(spark, path,
      Seq((102L, "novel thing")).toDF("bid", "bname"), "bid", "bname")
    val b2 = Seq((200L, "novl thing")).toDF("bid", "bname")
    val want2 = Set((200L, 102L, 1))
    assert(pairs(FuzzyJoin.probeFuzzyIndex(spark, path, b2, "bid", "bname", 2)) === want2)
    FuzzyJoin.appendToFuzzyIndex(spark, path, // crash-replay duplicate
      Seq((102L, "novel thing")).toDF("bid", "bname"), "bid", "bname")
    FuzzyJoin.compactFuzzyIndex(spark, path)
    assert(FuzzyJoin.readFuzzyMeta(spark, path) === 2)
    assert(pairs(FuzzyJoin.probeFuzzyIndex(spark, path, b2, "bid", "bname", 2)) === want2)
    // compaction left exactly the distinct variant set
    val idx = spark.read.parquet(path)
    assert(idx.count() === idx.distinct().count())
  }

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "tss", "event_type")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"), col("event_type"))

  test("funnel: strict ordering, gap boundary inclusive, per-step lag sums") {
    val day = 86400000000L
    val events = ev(Seq(
      // u1: full path; click at SAME ts as view must not count (strict >)
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:00:00", "click"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 02:00:00", "purchase"),
      // u2: click 8 days out — beyond the 7-day gap
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-09 00:00:00", "click"),
      // u3: no view — never enters the funnel
      (3L, "2024-01-01 00:00:00", "click"),
      // u4: click EXACTLY at +7d (inclusive <=); purchase BEFORE click
      (4L, "2024-01-01 00:00:00", "view"),
      (4L, "2024-01-08 00:00:00", "click"),
      (4L, "2024-01-05 00:00:00", "purchase")))
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapUs = 7L * day)
      .orderBy("step_idx")
      .select("step", "users", "total_lag_us").as[(String, Long, Long)].collect()
    assert(out(0) === (("view", 3L, 0L)))
    // u1 lag 1h, u4 lag 7d
    assert(out(1) === (("click", 2L, 3600000000L + 7L * day)))
    assert(out(2) === (("purchase", 1L, 3600000000L)))
  }

  test("funnel: unreached steps report zero users and zero lag") {
    val events = ev(Seq((1L, "2024-01-01 00:00:00", "view")))
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "signup"), maxGapUs = 1000000L)
      .orderBy("step_idx")
      .select("users", "total_lag_us").as[(Long, Long)].collect()
    assert(out(0) === ((1L, 0L)))
    assert(out(1) === ((0L, 0L)))
  }

  test("retentionCohorts: first-week cohorts, same-week dedup, offsets") {
    // 2024-01-01 is a Monday — weeks are Monday-aligned from 1970-01-05
    val events = ev(Seq(
      (1L, "2024-01-01 10:00:00", "view"),  // u1 cohort w, active w
      (1L, "2024-01-03 10:00:00", "view"),  // same week — dedups
      (1L, "2024-01-15 10:00:00", "view"),  // w+2
      (2L, "2024-01-08 10:00:00", "view"))) // u2 cohort w+1
    val out = Funnel.retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "users")
      .as[(Long, Long, Long)].collect()
    val w0 = out(0)._1
    assert(out.toSeq === Seq((w0, 0L, 1L), (w0, 2L, 1L), (w0 + 1, 0L, 1L)))
    // anchor sanity: 2024-01-01 minus 1970-01-05 = 19719 days → week 2817
    assert(w0 === 2817L)
  }
}
