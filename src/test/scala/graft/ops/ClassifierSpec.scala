package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-integer linear classifiers: hashed features, Rocchio centroid,
  * pocket perceptron. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  // two clearly separated vocabularies + shared noise words
  private val docs = Seq(
    (1L, "good fine great nice shared common"),
    (2L, "good great fine shared words here"),
    (3L, "fine nice good common tokens all"),
    (4L, "bad awful poor shared common"),
    (5L, "awful bad poor shared words too"),
    (6L, "poor bad awful common tokens all")).toDF("doc_id", "text")
  private val labels = docs.select(col("doc_id"),
    when(col("doc_id") <= 3, 1).otherwise(-1).as("y"))

  test("hashedFeatures: counts per (doc,bucket), buckets within range") {
    val f = Classifier.hashedFeatures(docs, "doc_id", "text", 64).collect()
    assert(f.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    // doc 1 has 6 distinct tokens (no repeats) → total count 6
    val total = Classifier.hashedFeatures(docs, "doc_id", "text", 64)
      .filter(col("doc_id") === 1).agg(sum("cnt")).head().getLong(0)
    assert(total == 6L)
  }

  test("centroid trainer separates disjoint vocabularies at 100%") {
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text", 256)
    val model = Classifier.trainCentroid(feats, labels)
    val scored = Classifier.score(feats, docs, model)
      .join(labels, Seq("doc_id")).collect()
    assert(scored.forall(r => r.getAs[Int]("pred") == r.getAs[Int]("y")))
    // class-symmetric data ⇒ shared-word weights cancel exactly
    assert(model.weights.nonEmpty)
  }

  test("centroid training is partitioning-invariant (exact integers)") {
    val feats1 = Classifier.hashedFeatures(docs.repartition(1), "doc_id", "text", 256)
    val feats7 = Classifier.hashedFeatures(docs.repartition(7), "doc_id", "text", 256)
    val m1 = Classifier.trainCentroid(feats1, labels)
    val m7 = Classifier.trainCentroid(feats7, labels)
    assert(m1 == m7)
  }

  test("batch perceptron converges on separable data; pocket returns it") {
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text", 256).cache()
    val model = Classifier.trainPerceptron(feats, labels, iterations = 20, pocket = true)
    val scored = Classifier.score(feats, docs, model)
      .join(labels, Seq("doc_id")).collect()
    feats.unpersist()
    assert(scored.forall { r =>
      val y = r.getAs[Int]("y"); val margin = r.getAs[Long]("margin")
      y * margin > 0 // strictly classified, both classes
    })
  }

  test("pocket keeps the best iterate when later ones regress") {
    // non-separable: identical features, opposite labels, plus one
    // separable doc — batch updates oscillate, pocket must not return a
    // worse-than-best iterate
    val conflict = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta")).toDF("doc_id", "text")
    val ys = conflict.select(col("doc_id"),
      when(col("doc_id") === 1, 1).otherwise(-1).as("y"))
    val feats = Classifier.hashedFeatures(conflict, "doc_id", "text", 64).cache()
    def errs(m: Classifier.LinearModel): Long =
      Classifier.score(feats, conflict, m).join(ys, Seq("doc_id"))
        .filter(col("pred") =!= col("y")).count()
    val pocketed = Classifier.trainPerceptron(feats, ys, iterations = 6, pocket = true)
    val plain = Classifier.trainPerceptron(feats, ys, iterations = 6, pocket = false)
    feats.unpersist()
    assert(errs(pocketed) <= errs(plain))
    assert(errs(pocketed) <= 1) // docs 1,2 conflict: at most one can be right
  }

  test("persisted centroid model: append equals full retrain, exactly") {
    val path = tmpDir("centroid-model").resolve("model").toString
    val b1 = docs.filter(col("doc_id") <= 2 || col("doc_id") === 4)
    val b2 = docs.filter(col("doc_id") === 3 || col("doc_id") >= 5)
    def feats(d: org.apache.spark.sql.DataFrame) =
      Classifier.hashedFeatures(d, "doc_id", "text", 256)
    def lbls(d: org.apache.spark.sql.DataFrame) =
      labels.join(d.select("doc_id"), Seq("doc_id"))
    Classifier.writeCentroidModel(feats(b1), lbls(b1), path)
    Classifier.appendCentroidModel(spark, path, feats(b2), lbls(b2))
    val appended = Classifier.readCentroidModel(spark, path)
    val retrained = Classifier.trainCentroid(feats(docs), labels)
    // additive sufficient statistics ⇒ bit-for-bit the same model
    assert(appended == retrained)
  }

  test("localMargin (row-local serving path) is bitwise equal to the join scorer") {
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text", 256)
    val model = Classifier.trainCentroid(feats, labels)
    val joined = Classifier.score(feats, docs, model)
      .select("doc_id", "margin", "pred").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val local = docs.select(col("doc_id"),
        Classifier.localMargin(col("text"), model).as("margin"),
        Classifier.localPred(col("text"), model).as("pred"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(local == joined)
  }

  test("persisted model self-heals the append swap's crash window") {
    val path = tmpDir("centroid-heal").resolve("model").toString
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text", 256)
    Classifier.writeCentroidModel(feats, labels, path)
    val before = Classifier.readCentroidModel(spark, path)
    // simulate a crash between swapDirs' delete and rename: the live
    // copy sits complete at sums.appending, sums is gone
    val fs = new java.io.File(path)
    assert(new java.io.File(fs, "sums").renameTo(new java.io.File(fs, "sums.appending")))
    assert(Classifier.readCentroidModel(spark, path) == before)
  }

  test("bigram features earn their cost: a word-order label unigrams cannot learn") {
    // every doc uses the SAME bag of words — only the order differs.
    // +1 docs contain the bigram "not good"; -1 docs contain "good not".
    // Unigram buckets are identical across classes by construction, so
    // no unigram linear model can beat chance; bigrams separate exactly.
    val ordered = (0 until 40).map { i =>
      val fill = Seq("alpha", "beta", "gamma").map(w => w + (i % 5))
      if (i % 2 == 0) (i.toLong, (fill :+ "not" :+ "good").mkString(" "))
      else (i.toLong, (fill :+ "good" :+ "not").mkString(" "))
    }.toDF("doc_id", "text")
    val y = ordered.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, 1).otherwise(-1).as("y"))
    def accuracy(bigrams: Boolean, buckets: Int): Double = {
      val f = Classifier.hashedFeatures(ordered, "doc_id", "text", buckets,
        bigrams = bigrams).cache()
      val m = Classifier.trainCentroid(f, y)
      val hit = Classifier.score(f, ordered, m).join(y, Seq("doc_id"))
        .filter(col("pred") === col("y")).count()
      f.unpersist()
      hit / 40.0
    }
    val uni = accuracy(bigrams = false, 256)
    val bi = accuracy(bigrams = true, 256)
    assert(uni <= 0.6, s"unigram model should sit at chance on an order-only label, got $uni")
    assert(bi == 1.0, s"bigram model should separate the order label exactly, got $bi")
    // numBuckets sweep: more buckets -> fewer collisions -> no worse
    val sweep = Seq(16, 64, 256).map(b => b -> accuracy(bigrams = true, b))
    assert(sweep.last._2 >= sweep.head._2,
      s"accuracy should not degrade with more buckets: $sweep")
  }

  test("score: docs with no overlapping features get margin 0") {
    val feats = Classifier.hashedFeatures(docs.filter(col("doc_id") <= 3),
      "doc_id", "text", 256)
    val model = Classifier.LinearModel(Map(0L -> 5L), 0L)
    val all = Classifier.score(
      Classifier.hashedFeatures(docs, "doc_id", "text", 256)
        .filter(col("doc_id") <= 3), docs, model)
    val absent = all.filter(col("doc_id") > 3).collect()
    assert(absent.forall(r => r.getAs[Long]("margin") == 0L && r.getAs[Int]("pred") == -1))
  }
}
