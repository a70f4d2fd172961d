package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-for-bit parity between the StaticInvoke kernels and the
  * declarative Catalyst formulations they replaced. The oracle gates
  * prove parity on the benchmark corpus; these prove it on adversarial
  * random data (ragged magnitudes, duplicates, empties, nulls, zero
  * vectors) — the kernels must be DROP-IN, not approximately equal. */
class KernelParitySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("dot kernel == aggregate(zip_with(...)) on 500 random vector pairs") {
    val rows = Seq.fill(500) {
      val dim = 1 + rnd.nextInt(96)
      (Array.fill(dim)(rnd.nextDouble() * math.pow(10, rnd.nextInt(7) - 3) - 0.5),
        Array.fill(dim)(rnd.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
    def declarative(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val out = df.select(
      graft.functions.VecOps.dot(col("a"), col("b")).as("k"),
      declarative(col("a"), col("b")).as("d")).collect()
    assert(out.forall(r => bits(r.getDouble(0)) == bits(r.getDouble(1))))
  }

  test("l2sqLong kernel == aggregate(zip_with(...)) on 500 random long-vector pairs") {
    val rows = Seq.fill(500) {
      val dim = 1 + rnd.nextInt(48)
      (Array.fill(dim)(rnd.nextLong() % 100000000L),
        Array.fill(dim)(rnd.nextLong() % 100000000L))
    }
    val df = rows.toDF("a", "b")
    def declarative(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val out = df.select(
      graft.functions.VecOps.l2sqLong(col("a"), col("b")).as("k"),
      declarative(col("a"), col("b")).as("d")).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    // ragged lengths raise typed, like dot
    val ragged = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      ragged.select(graft.functions.VecOps.l2sqLong(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("l2sqLong") ||
      Option(e.getCause).exists(_.getMessage.contains("l2sqLong")))
  }

  test("dotOrNull: NULL on ragged/null-element vectors, bitwise == dot on well-formed ones") {
    val good = Seq.fill(100) {
      val dim = 1 + rnd.nextInt(32)
      (Array.fill(dim)(rnd.nextGaussian()), Array.fill(dim)(rnd.nextGaussian()))
    }
    val out = good.toDF("a", "b").select(
      graft.functions.VecOps.dot(col("a"), col("b")).as("strict"),
      graft.functions.VecOps.dotOrNull(col("a"), col("b")).as("lenient")).collect()
    assert(out.forall(r => !r.isNullAt(1) && bits(r.getDouble(0)) == bits(r.getDouble(1))))
    // ragged lengths -> NULL (the strict kernel throws on the same input)
    val ragged = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(ragged.select(graft.functions.VecOps.dotOrNull(col("a"), col("b")))
      .collect().head.isNullAt(0))
    // local mode may surface the kernel's IllegalArgumentException raw
    // or wrapped in a SparkException — either way the job dies
    val strictFailure = intercept[Exception] {
      ragged.select(graft.functions.VecOps.dot(col("a"), col("b"))).collect()
    }
    assert(strictFailure.isInstanceOf[IllegalArgumentException] ||
      strictFailure.isInstanceOf[org.apache.spark.SparkException])
    // null element -> NULL; whole-column NULL propagates too
    val nullEl = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    assert(nullEl.select(graft.functions.VecOps.dotOrNull(col("a"), col("b")))
      .collect().head.isNullAt(0))
    val nullCol = Seq((Array(1.0), Option.empty[Array[Double]])).toDF("a", "b")
    assert(nullCol.select(graft.functions.VecOps.dotOrNull(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("normalize kernel == bound-norm transform on random vectors; zero vector passes through") {
    val rows = Seq.fill(300) {
      val dim = 1 + rnd.nextInt(64)
      Array.fill(dim)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(5) - 2))
    }
    val df = rows.map(Tuple1(_)).toDF("a")
    def declarative(a: Column): Column = {
      val norm = sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      element_at(transform(array(norm), n => transform(a, x => x / n)), 1)
    }
    val out = df.select(
      graft.functions.VecOps.normalize(col("a")).as("k"),
      declarative(col("a")).as("d")).collect()
    assert(out.forall { r =>
      val k = r.getSeq[Double](0); val d = r.getSeq[Double](1)
      k.length == d.length && k.indices.forall(i => bits(k(i)) == bits(d(i)))
    })
    // deliberate deviation from the old form (which raised ANSI
    // DIVIDE_BY_ZERO): a zero vector has no direction and is returned
    // unchanged, so cosines against it are 0 and the row survives
    val z = Seq(Tuple1(Array.fill(8)(0.0))).toDF("a")
      .select(graft.functions.VecOps.normalize(col("a"))).collect()
    assert(z.head.getSeq[Double](0).forall(_ == 0.0))
  }

  test("bandHashes kernel == xxhash64(slice(signature, ...)) on random shingle sets") {
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "")
    val rows = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(30))(
      s"${words(rnd.nextInt(words.size))} ${words(rnd.nextInt(words.size))}"
    )) ++ Seq(
      Seq.empty[String],                     // empty: all-MaxValue signature fold
      Seq(null.asInstanceOf[String], "a"),   // null elements are skipped
      Seq(null.asInstanceOf[String]))        // only nulls: same as empty
    val df = rows.map(Tuple1(_)).toDF("sh")
    val (numHashes, numBands) = (64, 16)
    val rowsPerBand = numHashes / numBands
    def declarative(sh: Column): Column = {
      val sig = graft.functions.MinHash.signature(sh, numHashes)
      array((0 until numBands).map(b =>
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)
    }
    val out = df.select(
      graft.functions.MinHash.bandHashes(col("sh"), numHashes, numBands).as("k"),
      declarative(col("sh")).as("d")).collect()
    assert(out.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("jaccard kernel == array_intersect/array_union form on random string sets incl. dups/empties/nulls") {
    val alphabet = Vector("a", "bb", "ccc", "", "dd", "e f", "ggg", "h", null)
    val rows = Seq.fill(500) {
      def arr() = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      (arr(), arr())
    } :+ ((Seq.empty[String], Seq.empty[String]))
    val df = rows.toDF("a", "b")
    def declarative(a: Column, b: Column): Column =
      size(array_intersect(a, b)).cast("double") /
        greatest(size(array_union(a, b)), lit(1)).cast("double")
    val out = df.select(
      graft.functions.Jaccard.jaccard(col("a"), col("b")).as("k"),
      declarative(col("a"), col("b")).as("d")).collect()
    assert(out.forall(r => bits(r.getDouble(0)) == bits(r.getDouble(1))))
  }

  test("BPE segment kernel == chained-replace fold on random words and learned-shaped merge chains") {
    // Bpe's (private) spaced form + literal merge replace, restated: the
    // kernel's contract is bitwise equality with exactly this fold
    def spaced(w: Column): Column =
      concat(lit(" "), rtrim(regexp_replace(w, "(.)", "$1  ")), lit(" "))
    def applyMerge(f: Column, l: String, r: String): Column =
      call_function("replace", f, lit(s" $l  $r "), lit(s" $l$r "))
    // a plausible chain: pairs drawn from a growing symbol pool so later
    // merges consume earlier outputs (multi-char symbols, same-output
    // collisions like (a,bc) vs (ab,c) both arise)
    val alphabet = Vector("a", "b", "c")
    var pool = alphabet
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < 24) {
      val l = pool(rnd.nextInt(pool.size))
      val r = pool(rnd.nextInt(pool.size))
      if (!seen((l, r)) && (l + r).length <= 6) {
        seen += ((l, r)); merges += ((l, r)); pool = pool :+ (l + r)
      }
    }
    val words = Seq.fill(400)(
      (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(3))).mkString) ++
      Seq("a", "abcabcabc", "aaaaaaaa", "cccccc")
    val df = words.map(Tuple1(_)).toDF("w")
    val fold = split(trim(
      merges.foldLeft(spaced(col("w")))((f, m) => applyMerge(f, m._1, m._2))), "  ")
    val out = df.select(
      graft.functions.BpeSegment.segment(col("w"), merges.toSeq).as("k"),
      fold.as("d")).collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
      s"word segmentation diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}"))
  }

  test("jlProject kernel == declarative unrolled sign-sum on 300 random vectors") {
    // mixed magnitudes, negatives, and values planted NEAR the .5
    // rounding boundary of round(x*1e4) — the kernel's away-from-zero
    // Math.round mirror must agree with Spark round() everywhere
    val rows = Seq.fill(300) {
      val extra = rnd.nextInt(3) // trailing dims beyond `dim` are ignored
      Array.fill(24 + extra)(rnd.nextInt(4) match {
        case 0 => rnd.nextGaussian()
        case 1 => -rnd.nextDouble() * 1000
        case 2 => (rnd.nextInt(2001) - 1000) / 2.0 * 1e-4 // exact k/2 * 1e-4
        case _ => rnd.nextDouble() * 1e-6
      })
    }.map(Tuple1(_))
    val df = rows.toDF("v")
    val out = df.select(
      graft.ops.Similarity.randomProject(col("v"), 24, 7, scale = 1e4).as("k"),
      graft.ops.Similarity.randomProjectDeclarative(col("v"), 24, 7,
        scale = 1e4).as("d")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      s"jl projection diverged: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}"))
  }
}
