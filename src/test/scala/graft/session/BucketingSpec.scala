package graft.session

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale technique evidence: bucketed tables co-locate join keys so
  * repeated fact-to-fact joins run WITHOUT a shuffle — the plan below is
  * asserted to contain no Exchange. At 100 TB this turns every recurring
  * join on the bucketing key from a full network shuffle into a local
  * zipped scan. */
class BucketingSpec extends SparkSpec {

  test("bucketed saveAsTable join plan has no shuffle exchange") {
    // default spark-warehouse dir (gitignored); warehouse.dir is a
    // static conf and cannot be set per-test
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    // a previously-failed run can orphan the managed-table location
    Seq("bkt_left", "bkt_right").foreach { t =>
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(loc)
        try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
    }
    left.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    // force the sort-merge path (tiny test tables would broadcast and
    // bypass the bucketed scan entirely)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)

      // contrast: the same join on unbucketed data DOES shuffle
      val unbucketed = left.join(right, "k")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
  }

  test("corpus bucketed by fingerprint: repeated dedup runs plan with no exchange") {
    // the 100 TB re-run story: pay the bucketed write once, then every
    // recurring dedup pass (daily ingest + re-dedup) aggregates bucket-
    // locally — no corpus-wide shuffle on any run after the first
    import graft.ops.Dedup
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"doc text ${i % 400}")).toDF("doc_id", "text")
      .withColumn("fp", xxhash64(col("text")))
    spark.sql("DROP TABLE IF EXISTS bkt_corpus")
    val loc = java.nio.file.Paths.get("spark-warehouse", "bkt_corpus")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    docs.write.bucketBy(8, "fp").sortBy("fp").saveAsTable("bkt_corpus")
    val corpus = spark.table("bkt_corpus")
    val groups = Dedup.exactGroups(corpus, "fp", "doc_id")
    val groupsPlan = groups.queryExecution.executedPlan.toString
    assert(!groupsPlan.contains("Exchange"),
      s"bucketed re-dedup aggregate should not shuffle:\n$groupsPlan")
    assert(groups.count() == 400)
    val kept = Dedup.exact(corpus, "fp", "doc_id")
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"),
      "window-based dedup over the bucketed corpus should not shuffle")
    assert(kept.count() == 400)
    // contrast: the same dedup on the unbucketed frame DOES shuffle
    assert(Dedup.exactGroups(docs, "fp", "doc_id")
      .queryExecution.executedPlan.toString.contains("Exchange"))
    spark.sql("DROP TABLE IF EXISTS bkt_corpus")
  }
}
