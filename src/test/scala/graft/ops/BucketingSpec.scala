package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Bucketed tables: the co-located join must plan with ZERO Exchange on
  * the bucketed sides and return exactly the plain-join result; layout
  * mismatches fail fast instead of silently shuffling. */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-bucket-$name-")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def withTables(names: String*)(body: => Unit): Unit =
    try body
    finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("co-located join: no Exchange in the plan, result matches plain join") {
    val facts = (0L until 1000L).map(i => (i % 97, i, s"f$i")).toDF("k", "fact_id", "payload")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "dim_name")
    // the co-located path is for LARGE×LARGE joins, where neither side
    // broadcasts — model that by disabling auto-broadcast (a broadcast
    // join would ignore bucketing entirely, as its plan notes)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withTables("b_facts", "b_dims") {
      Bucketing.writeBucketed(facts, "b_facts", "k", 8, Some(tmp("facts")))
      Bucketing.writeBucketed(dims, "b_dims", "k", 8, Some(tmp("dims")))

      val joined = Bucketing.coLocatedJoin(spark, "b_facts", "b_dims")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")

      val expected = facts.join(dims, Seq("k")).select("fact_id", "dim_name")
        .as[(Long, String)].collect().toSet
      val got = joined.select("fact_id", "dim_name").as[(Long, String)].collect().toSet
      assert(got == expected && got.size == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket-key aggregation also plans without Exchange") {
    val facts = (0L until 500L).map(i => (i % 13, i)).toDF("k", "v")
    withTables("b_agg") {
      Bucketing.writeBucketed(facts, "b_agg", "k", 4, Some(tmp("agg")))
      val agg = spark.table("b_agg").groupBy("k").agg(sum("v").as("s"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() == 13)
    }
  }

  test("mismatched bucket layouts fail fast instead of silently shuffling") {
    val df = (0L until 10L).map(i => (i, i)).toDF("k", "v")
    withTables("b_m8", "b_m4", "b_plain") {
      Bucketing.writeBucketed(df, "b_m8", "k", 8, Some(tmp("m8")))
      Bucketing.writeBucketed(df, "b_m4", "k", 4, Some(tmp("m4")))
      df.write.mode(SaveMode.Overwrite).option("path", tmp("plain")).saveAsTable("b_plain")
      val e = intercept[IllegalArgumentException](
        Bucketing.coLocatedJoin(spark, "b_m8", "b_m4"))
      assert(e.getMessage.contains("bucket layouts differ"))
      intercept[IllegalArgumentException](
        Bucketing.coLocatedJoin(spark, "b_m8", "b_plain"))
    }
  }
}
