package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val targetish = Seq(
    (1L, "quantum physics entangles particles across space"),
    (2L, "quantum field theory predicts particles and forces"),
    (3L, "particles in quantum superposition collapse on measurement"))
  private val noise = Seq(
    (11L, "buy cheap pills online now best prices guaranteed"),
    (12L, "click here subscribe newsletter win prizes today"),
    (13L, "cheap prices click now buy today guaranteed win"))

  test("ngramImportance: target-like docs outscore noise; every raw row present") {
    val raw = (targetish ++ noise ++ Seq((21L, ""), (22L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val got = Importance.ngramImportance(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 11L, 12L, 13L, 21L, 22L))
    // empty/null text: no grams, score 0
    assert(got(21L) == ((0L, 0L)) && got(22L) == ((0L, 0L)))
    // per-gram normalized target affinity separates the classes
    def perGram(id: Long) = got(id)._2.toDouble / got(id)._1
    val worstTarget = Seq(1L, 2L, 3L).map(perGram).min
    val bestNoise = Seq(11L, 12L, 13L).map(perGram).max
    assert(worstTarget > bestNoise,
      s"target per-gram $worstTarget must beat noise $bestNoise")
  }

  test("ngramImportance: deterministic under partitioning; bigrams shift scores") {
    val raw = (targetish ++ noise).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    def run(parts: Int, bi: Boolean) =
      Importance.ngramImportance(raw.repartition(parts), target, "doc_id",
          "text", bigrams = bi)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(1, bi = false) == run(7, bi = false))
    assert(run(1, bi = true) == run(5, bi = true))
    // bigram feature space counts more grams per doc
    val uni = run(1, bi = false).map(r => r(1).asInstanceOf[Long]).sum
    val bi = run(1, bi = true).map(r => r(1).asInstanceOf[Long]).sum
    assert(bi > uni)
  }

  test("ngramImportance: logWeights ranks like the ratio variant on separated classes") {
    val raw = (targetish ++ noise).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val logScores = Importance.ngramImportance(raw, target, "doc_id", "text",
        logWeights = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // log-ratio weights are negative on noise-only buckets, positive on
    // target-heavy ones — the class gap survives the transform
    assert(Seq(1L, 2L, 3L).map(logScores).min >
      Seq(11L, 12L, 13L).map(logScores).max)
  }

  test("ngramImportance: guards — empty target and bad params raise") {
    val raw = targetish.toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Importance.ngramImportance(raw, empty, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      Importance.ngramImportance(raw, raw, "doc_id", "text", numBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      Importance.ngramImportance(raw, raw, "doc_id", "text", scale = 0L)
    }
  }

  test("persisted model: score parity with the inline scorer; append == rebuild; unseen buckets weighted") {
    val raw = (targetish ++ noise).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val base = graft.Paths.scratchDir("imp-model-")
    val p1 = base.resolve("m1").toString
    // write from (raw, target), score raw → must equal ngramImportance
    // bitwise (same weight expression, every raw bucket covered)
    Importance.writeImportanceModel(raw, target, "doc_id", "text", p1)
    val inline = Importance.ngramImportance(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val served = Importance.scoreWithModel(spark, p1, raw, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(served == inline, "persisted-model scoring must match inline")
    // append == rebuild: seed with half of each corpus, append the rest
    val p2 = base.resolve("m2").toString
    Importance.writeImportanceModel(
      raw.filter(col("doc_id") % 2 === 0), target.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", p2)
    Importance.appendImportanceModel(spark, p2,
      raw.filter(col("doc_id") % 2 === 1), target.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val appended = Importance.scoreWithModel(spark, p2, raw, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(appended == inline, "append must equal single-shot rebuild")
    // a batch hashing into buckets the seed never saw still scores:
    // every gram unseen → every bucket weight is the smoothed default
    val novel = Seq((99L, "zzqx wvplk mmtrn")).toDF("doc_id", "text")
    val ns = Importance.scoreWithModel(spark, p1, novel, "doc_id", "text")
      .head()
    assert(ns.getLong(1) == 3L && ns.getLong(2) > 0L,
      "unseen-bucket grams must get the smoothed weight, not drop")
    // append-only-raw (empty target side) shifts cr but keeps serving
    Importance.appendImportanceModel(spark, p1, novel,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    val after = Importance.scoreWithModel(spark, p1, novel, "doc_id", "text")
      .head()
    assert(after.getLong(2) < ns.getLong(2),
      "appending the novel doc to the raw pool must lower its ratio score")
  }

  test("persisted model: corrupt artifacts raise typed errors") {
    val base = graft.Paths.scratchDir("imp-corrupt-")
    val p = base.resolve("m").toString
    val raw = targetish.toDF("doc_id", "text")
    // missing config row
    raw.sparkSession.range(1)
      .select(lit(-1L).as("bucket"), lit(5L).as("ct"), lit(5L).as("cr"))
      .write.parquet(s"$p/sums")
    val e1 = intercept[IllegalArgumentException] {
      Importance.scoreWithModel(spark, p, raw, "doc_id", "text")
    }
    assert(e1.getMessage.contains("no config row"))
    // empty target in the persisted totals
    val p3 = base.resolve("m3").toString
    raw.sparkSession.range(1).select(lit(-1L).as("bucket"),
        lit(0L).as("ct"), lit(9L).as("cr"))
      .unionAll(raw.sparkSession.range(1).select(lit(-2L).as("bucket"),
        lit(256L).as("ct"), lit(0L).as("cr")))
      .write.parquet(s"$p3/sums")
    val e2 = intercept[IllegalArgumentException] {
      Importance.scoreWithModel(spark, p3, raw, "doc_id", "text")
    }
    assert(e2.getMessage.contains("empty target"))
  }

  test("ngramImportance: scoring raw against itself is near-uniform per gram") {
    // target == raw ⇒ every bucket ratio is exactly 1 ⇒ every weight is
    // exactly `scale` ⇒ score = n_grams · scale
    val raw = (targetish ++ noise).toDF("doc_id", "text")
    val got = Importance.ngramImportance(raw, raw, "doc_id", "text")
      .collect()
    for (r <- got)
      assert(r.getLong(2) == r.getLong(1) * 1000000L,
        s"doc ${r.getLong(0)}: self-importance must be n_grams·scale")
  }
}
