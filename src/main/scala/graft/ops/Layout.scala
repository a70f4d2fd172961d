package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering for
  * multi-dimensional file pruning.
  *
  * Parquet scans skip whole files/row-groups whose footer min/max
  * ranges miss the query predicate — but a table sorted by ONE column
  * leaves every OTHER column's range wide in every file, so 2-D box
  * queries (user × time, domain × quality, …) prune nothing. Writing in
  * Z-order interleaves the bits of two key columns, so each output file
  * covers a small rectangle of the key space and a box predicate
  * intersects only a few files — the standard lakehouse layout trick,
  * here with an exact-integer z-value both engines can recompute
  * (gate p15).
  *
  * Scale shape: the z-value is one per-row projection (16 exact
  * power-of-two steps — dividing a double by 2^i is lossless, and every
  * operand stays < 2^32); the write is one range repartition on z (the
  * same shuffle any global sort pays) + an in-partition sort. No
  * driver state.
  */
object Layout {

  /** Morton interleave of the LOW `bits` bits of two integer columns
    * (inputs are masked to those bits first, so negative or oversized
    * keys take their two's-complement low bits instead of producing
    * engine-divergent garbage): bit i of `a` lands at position 2i+1,
    * bit i of `b` at 2i. Unrolled to literal shift/mask terms — pure
    * integer whole-stage codegen, no higher-order function, no per-row
    * pow(); an external engine replays the same bits with floor
    * divisions by 2^i over the masked values. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits not in [1, 31]")
    val mask = lit((1L << bits) - 1L)
    val al = a.cast("long").bitwiseAND(mask)
    val bl = b.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Write `df` parquet-clustered in Z-order on two non-negative
    * integer key expressions: each of the `numFiles` output files
    * covers a contiguous z range ≈ a small rectangle of the (a, b) key
    * space, so box predicates on BOTH keys prune to a handful of files
    * (footer min/max skipping) where a single-column sort prunes only
    * its own column. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column — the write would silently replace it")
    val cols = df.columns.toSeq
    df.withColumn("__graft_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .select(cols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order write with PRE-PLANNED range boundaries (from
    * [[Sketch.histBoundaries]] over a z-value histogram sketch) instead
    * of `repartitionByRange`'s per-write reservoir sampling: no
    * sampling pass, and the file ranges are DETERMINISTIC — the same
    * boundaries give the same file layout run after run, so an
    * append/compact lifecycle keeps stable range ownership and a
    * persisted hist index amortizes one corpus pass across every write
    * planned from it.
    *
    * Placement mechanics: the range index (count of boundaries ≤ z) is
    * remapped through a driver-computed bijection so Spark's HASH
    * partitioner sends each range to its OWN shuffle partition —
    * `pmod(hash(remap(i)), k) == i` by construction, collisions
    * impossible — then `sortWithinPartitions(z)` makes every output
    * file a contiguous z range, exactly like [[zorderWrite]]. Null z
    * (null keys) lands in range 0, matching [[compactZorder]]'s
    * nulls-first convention. Boundary semantics: file i covers
    * [b_{i−1}, b_i) except file 0 = (−∞, b_0) and file k−1 = [b_{k−2}, ∞). */
  def zorderWritePlanned(df: DataFrame, a: Column, b: Column, path: String,
      boundaries: Seq[Long], bits: Int = 16): Unit = {
    for (c <- Seq("__graft_z", "__graft_p"))
      require(!df.columns.contains(c),
        s"input already has a $c column — the write would silently replace it")
    require(boundaries == boundaries.sorted,
      s"boundaries must be ascending, got $boundaries")
    val cols = df.columns.toSeq
    val k = boundaries.size + 1
    val z = zValue(a, b, bits)
    if (k == 1) {
      df.withColumn("__graft_z", z).coalesce(1)
        .sortWithinPartitions(col("__graft_z"))
        .select(cols.map(c => col(s"`$c`")): _*)
        .write.mode("overwrite").parquet(path)
      return
    }
    // range index = count of boundaries ≤ z, as ONE constant-size
    // expression over a sorted array literal — a k-deep when() chain
    // would blow whole-stage codegen's method limit at large k. The
    // lambda references the __graft_z COLUMN (already bound), never the
    // z expression tree — the HOF-blocks-CSE trap. Null z → every
    // comparison null → filter keeps nothing → range 0 (nulls first,
    // matching compactZorder's convention).
    val part = size(filter(typedlit(boundaries.toList),
      bnd => bnd <= col("__graft_z")))
    val remap = hashBijection(df.sparkSession, k)
    df.withColumn("__graft_z", z)
      .withColumn("__graft_p",
        element_at(typedlit(remap), part + lit(1)))
      .repartition(k, col("__graft_p"))
      .sortWithinPartitions(col("__graft_z"))
      .select(cols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** For each residue i in 0..k−1, a long v with
    * `pmod(hash(v), k) == i` — computed with Spark's OWN `hash`
    * expression (the exact function `repartition(k, col)` places by),
    * so the remap can never drift from the partitioner. One tiny job
    * over 64·k candidate longs (coupon-collector needs ~k·ln k);
    * deterministic given k. */
  private[ops] def hashBijection(
      spark: org.apache.spark.sql.SparkSession, k: Int): Seq[Long] = {
    var span = 64L * k
    while (span < Int.MaxValue.toLong) {
      val found = spark.range(0, span)
        .select(col("id"), pmod(hash(col("id")), lit(k)).as("r"))
        .groupBy(col("r")).agg(min(col("id")).as("v"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      if (found.size == k) return (0 until k).map(found)
      span *= 4 // astronomically unlikely; loud loop rather than silent gap
    }
    throw new IllegalStateException(
      s"hashBijection: could not cover all $k residues")
  }

  /** Per-file (min, max) ranges of two columns in a written table —
    * the footer statistics a pruning scan consults, surfaced so layout
    * quality is measurable: a box query's CANDIDATE files are those
    * whose ranges intersect the box. */
  def fileRanges(df: DataFrame, a: String, b: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("a_min"), max(col(a)).as("a_max"),
        min(col(b)).as("b_min"), max(col(b)).as("b_max"))

  // ------------------------------------------------------- lifecycle
  //
  // Continuous ingest over a z-ordered table, same discipline as the
  // MinHash/digest indexes: appends are cheap and local, compaction
  // restores global layout quality with a two-phase swap, and readers
  // heal the delete→rename crash window at restartable points.

  /** Self-heal a z-ordered table before reading/writing: recovers the
    * delete→rename crash window of [[compactZorder]] (no-op when the
    * table dir is intact). Call at restartable read points. */
  def healZorder(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    FsOps.healSwap(spark, path + ".compacting", path)

  /** Append a batch to a [[zorderWrite]] table WITHOUT re-sorting the
    * table: the batch is z-clustered internally and lands as new files
    * in the same directory (plain `spark.read.parquet(path)` sees all
    * rows immediately). Layout quality degrades as appended files'
    * z-ranges overlap the base files' — box queries stay correct, just
    * with more candidate files — until [[compactZorder]] re-clusters.
    * At 100 TB this is the only viable ingest shape: per-batch cost is
    * one range shuffle of the BATCH, never a table re-sort. */
  def appendZorder(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int = 1, bits: Int = 16): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column — the write would silently replace it")
    healZorder(df.sparkSession, path)
    val cols = df.columns.toSeq
    df.withColumn("__graft_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .select(cols.map(c => col(s"`$c`")): _*)
      .write.mode("append").parquet(path)
  }

  /** Re-cluster ONLY the z-overlapping region of an appended-to table,
    * restoring fresh-write pruning quality without a global re-sort:
    *
    *  1. one narrow scan computes each file's z interval;
    *  2. a driver sweep (file counts, not data) merges transitively
    *     overlapping intervals into groups — a connected overlap
    *     group's union is CONTIGUOUS, so group envelopes are disjoint
    *     and rows re-partitioned within a group can never straddle
    *     another group's range;
    *  3. singleton groups are already-disjoint files: carried over as
    *     raw byte copies (no decode, no shuffle) issued as one executor
    *     task per file — the carry scales with the cluster, not the
    *     driver (a 100 TB table is mostly clean files at compact time);
    *  4. each multi-file group is re-read and range-re-partitioned on z
    *     into `ceil(groupRows / (totalRows / numFiles))` files;
    *  5. the new table swaps in whole-dir two-phase ([[FsOps.swapDirs]];
    *     crash window healed by [[healZorder]]).
    *
    * `a`/`b` must be the same key expressions the table was written
    * with (they are recomputed from stored columns). Returns the number
    * of files rewritten (0 = table was already fully disjoint; the
    * copy-through is skipped entirely). */
  def compactZorder(spark: org.apache.spark.sql.SparkSession, path: String,
      a: Column, b: Column, numFiles: Int, bits: Int = 16): Int = {
    require(numFiles >= 1, "numFiles must be >= 1")
    healZorder(spark, path)
    // sweep inflight temps a PREVIOUS compaction's zombie attempts may
    // have recreated after that run's own pre-swap sweep (task kills
    // are asynchronous): dot-prefixed so invisible to readers, but
    // full-size — without this they'd accumulate as a silent disk leak
    // across compactions. Safe here: this run hasn't started copying,
    // and concurrent compactions of one table are unsupported (their
    // swaps would race), so any .inflight file is a dead attempt's.
    val fsSweep = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (st <- Option(fsSweep.globStatus(new org.apache.hadoop.fs.Path(
        path, ".*.inflight.*"))).toSeq.flatten)
      fsSweep.delete(st.getPath, false)
    // null-keyed rows produce null z (zValue null-propagates) — coalesce
    // to Long.MinValue so their files sort and group FIRST, matching
    // where repartitionByRange places null z values on the rewrite path
    // (min/max would otherwise skip them and getLong would NPE on an
    // all-null file)
    val stats = spark.read.parquet(path)
      .select(input_file_name().as("file"),
        coalesce(zValue(a, b, bits), lit(Long.MinValue)).as("z"))
      .groupBy(col("file"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"),
        count(lit(1)).as("rows"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    if (stats.isEmpty) return 0
    // interval sweep: sort by zmin, extend the current group while the
    // next interval starts inside the group's running envelope
    val sorted = stats.sortBy(s => (s._2, s._3, s._1))
    val groups = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(sorted.head))
    var hi = sorted.head._3
    for (s <- sorted.tail) {
      if (s._2 <= hi) groups.last += s
      else groups += scala.collection.mutable.ArrayBuffer(s)
      hi = math.max(hi, s._3)
    }
    val dirty = groups.filter(_.size > 1)
    if (dirty.isEmpty) return 0 // fully disjoint already — nothing to do
    // proportional file budget across dirty groups (largest-remainder,
    // ≥1 each) so the total file count — and therefore the row-quantile
    // boundary placement — matches a fresh numFiles-way write instead of
    // drifting upward from per-group ceils
    val cleanCount = groups.size - dirty.size
    val budget = math.max(dirty.size, numFiles - cleanCount)
    val dirtyRows = dirty.map(_.map(_._4).sum)
    val totalDirtyRows = math.max(1L, dirtyRows.sum)
    val raw = dirtyRows.map(r => budget.toDouble * r / totalDirtyRows)
    val ks = raw.map(x => math.max(1, x.toInt)).toArray
    var left = budget - ks.sum
    if (left > 0) {
      val order = raw.zipWithIndex.sortBy { case (x, _) => -(x - x.toInt) }.map(_._2)
      var i = 0
      while (left > 0 && i < order.size) { ks(order(i)) += 1; left -= 1; i += 1 }
    } else if (left < 0) {
      // the max(1, _) floors can overshoot the budget (many tiny dirty
      // groups next to one dominant one) — reclaim from the smallest
      // fractional parts, never below 1 per group. budget ≥ dirty.size
      // guarantees the loop terminates with left == 0.
      val order = raw.zipWithIndex.sortBy { case (x, _) => x - x.toInt }.map(_._2)
      while (left < 0) {
        var changed = false
        for (idx <- order if left < 0 && ks(idx) > 1) {
          ks(idx) -= 1; left += 1; changed = true
        }
        // budget >= dirty.size, so a full pass always finds a group
        // above its floor while left < 0 — fail loudly if not
        if (!changed) throw new IllegalStateException(
          s"compactZorder allocation invariant broken: left=$left ks=${ks.toSeq}")
      }
    }
    val tmpPath = path + ".compacting"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    // clean singletons: raw byte copy, original filenames kept (proof
    // to specs — and operators — that they were not rewritten). The
    // copies run as EXECUTOR tasks, one file each: at 100 TB a
    // compaction typically finds a few dirty groups among tens of
    // thousands of clean files, and streaming those serially through
    // the driver was the scale bottleneck (round-6 review finding).
    // The hadoop conf rides a broadcast (Configuration is Writable) so
    // filesystem credentials/settings survive into the tasks.
    val cleanFiles = groups.filter(_.size == 1).map(_.head._1).toVector
    if (cleanFiles.nonEmpty) {
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.SerializableWritable(
          spark.sparkContext.hadoopConfiguration))
      val nSlices = math.min(cleanFiles.size,
        math.max(1, spark.sparkContext.defaultParallelism * 2))
      spark.sparkContext.parallelize(cleanFiles, nSlices)
        .foreachPartition { it =>
          val conf = confBc.value.value
          val dstDir = new org.apache.hadoop.fs.Path(tmpPath)
          // retries and speculative/zombie duplicates are both possible:
          // each attempt copies to its OWN dot-prefixed temp (invisible
          // to readers even if leaked) and publishes with an atomic
          // rename — rename-to-existing fails, so exactly one complete
          // copy ever owns the final name; a shared-final-name overwrite
          // would let a zombie re-truncate a finished file (silent
          // corruption), and overwrite=false would abort honest retries
          val attemptId = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          it.foreach { uri =>
            val src = new org.apache.hadoop.fs.Path(new java.net.URI(uri))
            val sfs = src.getFileSystem(conf)
            val dst = new org.apache.hadoop.fs.Path(dstDir, src.getName)
            val tmpF = new org.apache.hadoop.fs.Path(dstDir,
              "." + src.getName + ".inflight." + attemptId)
            org.apache.hadoop.fs.FileUtil.copy(sfs, src, sfs, tmpF,
              false, true, conf)
            if (!sfs.rename(tmpF, dst)) {
              // rename=false is only benign when a duplicate attempt
              // already published dst — any other cause (vanished src,
              // parent trouble) must fail LOUDLY here, or the swap would
              // silently publish a table missing this file's rows
              if (!sfs.exists(dst)) throw new java.io.IOException(
                s"compactZorder: carry of $src to $dst failed (no duplicate present)")
              sfs.delete(tmpF, false)
            }
          }
        }
      confBc.destroy()
      // zombie/killed attempts can leak dot-prefixed inflight temps
      // (invisible to readers but full-size) — sweep them before the
      // swap publishes the directory
      for (st <- Option(fs.globStatus(
          new org.apache.hadoop.fs.Path(tmp, ".*.inflight.*"))).toSeq.flatten)
        fs.delete(st.getPath, false)
    }
    // dirty groups: re-cluster each within its (disjoint) envelope
    var rewritten = 0
    val cols = spark.read.parquet(path).columns.toSeq
    for ((g, k) <- dirty.zip(ks)) {
      // decode the input_file_name URIs like the singleton branch —
      // Hadoop Path(String) would re-quote '%' or truncate at '#'
      spark.read.parquet(g.map(s =>
        new org.apache.hadoop.fs.Path(new java.net.URI(s._1)).toString).toSeq: _*)
        .withColumn("__graft_z", zValue(a, b, bits))
        .repartitionByRange(k, col("__graft_z"))
        .sortWithinPartitions(col("__graft_z"))
        .select(cols.map(c => col(s"`$c`")): _*)
        .write.mode("append").parquet(tmpPath)
      rewritten += g.size
    }
    FsOps.swapDirs(spark, tmpPath, path)
    rewritten
  }
}
