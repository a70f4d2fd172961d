package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Perceptual-hash kernel specs: the re-encoded-copy property (the
  * whole point of the operator — mm03's exact dedup keeps every
  * re-encode; dHash folds them), edge shapes, and the Column surface.
  */
class PerceptualHashSpec extends SparkSpec {

  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** A sawtooth "image" signal — same family as the mm05 gate. */
  private def signal(phase: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((phase * 31 + i * 7) % 251).toByte)

  test("re-encoded copy hashes within 3 bits; unrelated image far; exact copy = 0") {
    val orig = signal(5, 220)
    // lossy re-encode stand-in: +40 blocking artifact on every 8th
    // 16-byte block (clamped), exactly the mm05 perturbation
    val reenc = orig.zipWithIndex.map { case (b, i) =>
      if ((i >> 4) % 8 == 0) math.min(255, (b & 0xFF) + 40).toByte else b
    }
    val h0 = PerceptualHashImpl.dhash63(orig)
    val hr = PerceptualHashImpl.dhash63(reenc)
    assert(ham(h0, hr) <= 3, s"re-encode drifted ${ham(h0, hr)} bits")
    assert(PerceptualHashImpl.dhash63(orig.clone()) == h0)
    // a structurally different signal (descending ramp) is far away
    val other = Array.tabulate(220)(i => (250 - (i * 7) % 251).toByte)
    assert(ham(h0, PerceptualHashImpl.dhash63(other)) > 10)
  }

  test("brightness shift is perceptually invariant away from wraps") {
    // adding a constant shifts every cell equally -> comparisons hold
    // except where the +offset wraps past 255; a small shift on a
    // mid-range signal flips nothing
    val base = Array.tabulate(200)(i => (60 + (i * 7) % 120).toByte)
    val brighter = base.map(b => ((b & 0xFF) + 10).toByte)
    assert(ham(PerceptualHashImpl.dhash63(base),
      PerceptualHashImpl.dhash63(brighter)) == 0)
  }

  test("edge shapes: empty, single byte, sub-64-byte payloads, high bit unset") {
    assert(PerceptualHashImpl.dhash63(Array.emptyByteArray) == 0L)
    // constant signals have no descents -> hash 0
    assert(PerceptualHashImpl.dhash63(Array.fill(1)(42.toByte)) == 0L)
    assert(PerceptualHashImpl.dhash63(Array.fill(63)(7.toByte)) == 0L)
    // sub-64-byte payloads: windows clamp to >= 1 element, never crash,
    // and a descending short signal sets bits
    val short = Array.tabulate(10)(i => (200 - 20 * i).toByte)
    val hs = PerceptualHashImpl.dhash63(short)
    assert(hs > 0L)
    // bit 63 is never set: the hash is always non-negative
    val spiky = Array.tabulate(300)(i => (if (i % 2 == 0) 255 else 0).toByte)
    assert(PerceptualHashImpl.dhash63(spiky) >= 0L)
    assert(hs >= 0L)
  }

  test("Column surface: StaticInvoke == direct call; null propagates; bands find the copy") {
    val rows = Seq(
      (1L, signal(5, 220)),
      (2L, signal(5, 220).zipWithIndex.map { case (b, i) =>
        if ((i >> 4) % 8 == 0) math.min(255, (b & 0xFF) + 40).toByte else b }),
      (3L, Array.tabulate(220)(i => (250 - (i * 7) % 251).toByte)),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "payload")
      .withColumn("ph", PerceptualHash.dhash(col("payload")))
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    rows.foreach { case (id, p) =>
      val expect = Option(p).map(PerceptualHashImpl.dhash63)
      assert(got(id) == expect, s"id $id")
    }
    // the SimHash pigeonhole band machinery pairs the re-encode with
    // its original (and nothing else at maxDistance 3)
    val pairs = Dedup.simhashPairs(df.filter(col("ph").isNotNull), "id", "ph",
        maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"$pairs")
  }

  test("videoNearDupPairs: aligned frame voting finds edited copies, counts honest") {
    // 4-frame "videos" of 64-byte frames; B = A with one frame swapped
    // for a different scene, C = unrelated
    def frame(seed: Int): Array[Byte] =
      Array.tabulate(64)(i => (((seed + 3) * (i * i + 7 * i)) % 251).toByte)
    def video(seeds: Int*): Array[Byte] = seeds.flatMap(frame).toArray
    val df = Seq(
      (1L, video(10, 20, 30, 40)),
      (2L, video(10, 20, 999, 40)), // frame 2 replaced
      (3L, video(70, 80, 90, 95)))
      .toDF("doc_id", "content")
    val out = graft.ops.Multimodal.videoNearDupPairs(df, "doc_id", "content",
        frameBytes = 64, stride = 1, maxDistance = 3, minMatched = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)), s"${out.toSeq}")
    // raising the vote threshold to all-4 drops the edited copy
    assert(graft.ops.Multimodal.videoNearDupPairs(df, "doc_id", "content",
      frameBytes = 64, stride = 1, maxDistance = 3, minMatched = 4L).count() == 0L)
    // composite-key contract: negative ids raise typed
    val e = intercept[Exception] {
      graft.ops.Multimodal.videoNearDupPairs(
        Seq((-1L, video(10, 20, 30, 40))).toDF("doc_id", "content"),
        "doc_id", "content", frameBytes = 64, stride = 1).count()
    }
    assert(e.getMessage.contains("composite") ||
      Option(e.getCause).exists(_.getMessage.contains("composite")))
  }
}
