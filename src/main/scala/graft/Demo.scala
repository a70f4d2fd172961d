package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.session.GraftSession
import graft.sinks.DumpOptions

/** Runnable tour ≈ the reference's godoc examples (`example_test.go`):
  * create fixture files, open them, query, mutate, dump, reopen.
  * `sbt "runMain graft.Demo"` — output is deterministic. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-demo-")
    Files.writeString(dir.resolve("users.csv"),
      """id,name,age,team,joined
        |1,Alice,34,infra,2021-04-01
        |2,Bob,29,data,2022-11-15
        |3,Carol,41,infra,2019-07-23
        |4,Dan,25,data,2023-02-02
        |""".stripMargin)
    Files.writeString(dir.resolve("teams.tsv"),
      "team\tbudget\ninfra\t1200000\ndata\t800000\n")

    val sess = GraftSession.open(spark, dir.toString)
    println("tables: " + sess.tableNames.sorted.mkString(", "))
    println("inferred users schema: " + sess.table("users").schema.simpleString)

    println("\n-- join + aggregate --")
    sess.sql("""SELECT t.team, COUNT(*) AS members, AVG(u.age) AS avg_age, MAX(t.budget) AS budget
               |FROM users u JOIN teams t ON u.team = t.team
               |GROUP BY t.team ORDER BY t.team""".stripMargin)
      .show(truncate = false)

    println("-- window + dialect functions --")
    sess.sql("""SELECT name, team, age,
               |  RANK() OVER (PARTITION BY team ORDER BY age DESC) AS rank_in_team,
               |  strftime('%Y', joined) AS join_year
               |FROM users ORDER BY team, rank_in_team""".stripMargin)
      .show(truncate = false)

    println("-- mutation --")
    sess.sql("INSERT INTO users VALUES (5, 'Eve', 31, 'infra', timestamp '2024-06-01')")
    sess.sql("UPDATE users SET age = age + 1 WHERE team = 'data'")
    sess.sql("DELETE FROM users WHERE id = 1")
    sess.sql("SELECT id, name, age, team FROM users ORDER BY id").show(truncate = false)

    println("-- transactions: ROLLBACK undoes a batch --")
    sess.sql("BEGIN")
    sess.sql("DELETE FROM users WHERE age >= 30")
    sess.sql("ROLLBACK")
    println("after rollback, users: " +
      sess.sql("SELECT COUNT(*) FROM users").head().getLong(0))

    println("\n-- DDL + PRAGMA + changes() --")
    sess.sql("CREATE TABLE vip AS SELECT name, age FROM users WHERE age >= 30")
    sess.sql("PRAGMA table_info(vip)").show(truncate = false)
    sess.sql("UPDATE vip SET age = age + 1 WHERE age < 40")
    println("changes(): " + sess.sql("SELECT changes()").head().getLong(0))
    sess.sql("ALTER TABLE vip ADD COLUMN tier TEXT DEFAULT 'gold'")
    sess.sql("SELECT * FROM vip ORDER BY name").show(truncate = false)
    sess.sql("DROP TABLE vip")

    println("-- dump to parquet and reopen --")
    val out = Files.createTempDirectory("graft-demo-out-")
    sess.dump(out.toString, DumpOptions(format = "parquet"))
    sess.close()
    val sess2 = GraftSession.open(spark, out.toString)
    println("reopened row count: " +
      sess2.sql("SELECT COUNT(*) FROM users").head().getLong(0))
    sess2.close()

    println("\n-- training-data pipeline: quality -> dedup -> split --")
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, Sampling, TextAnalysis}
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "The quick brown fox jumps over the lazy dog near the river bank!!"), // near-dup of 0
      (2L, "spark shuffles partition data across executors during wide transformations"),
      (3L, "x"), // too short: fails the quality gate
      (4L, "completely different text about parquet files and columnar storage layouts"),
      (5L, "broadcast joins keep the fact table local while dimensions ship to executors"),
      (6L, "adaptive query execution replans shuffles from runtime statistics"),
      (7L, "columnar scanners prune pages using min max statistics per column chunk"),
      (8L, "watermarks bound how late an event may arrive before its window closes"),
      (9L, "bucketed tables co locate join keys so recurring joins skip the exchange"))
      .toDF("doc_id", "text")
    val quality = TextAnalysis.qualityMetrics(docs).filter(col("word_cnt") >= 3)
    // dedup keeps each normalized-content group's canonical doc; chain the
    // SURVIVORS into the split (not the pre-dedup set)
    val survivors = quality.join(
      Dedup.exactGroupsByHash(
        quality.select(col("doc_id"),
          TextAnalysis.normalizeForDedup(col("text")).as("norm")),
        "norm", "doc_id").select(col("canonical_id").as("doc_id")),
      Seq("doc_id"))
    println("quality-pass docs: " + quality.count() +
      ", dedup survivors: " + survivors.count())
    val split = Sampling.splitByHash(survivors, col("doc_id"),
      Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
    split.groupBy("split").count().orderBy("split").show(truncate = false)

    println("-- similarity search over embeddings --")
    import graft.ops.Similarity
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.1f, 1.0f, 0.2f)),
      (3L, Array(0.1f, 0.0f, 0.9f, 0.3f))).toDF("vec_id", "embedding")
    Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", k = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .show(truncate = false)

    println("-- int8-quantized search: same query, 1-byte codes --")
    Similarity.int8TopK(vecs.filter(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", k = 2)
      .show(truncate = false)

    println("-- incremental maintenance: upsert a delta, fold a CDC batch --")
    import graft.ops.Merge
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    val delta = Seq((2L, "b-updated", 25.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    Merge.upsert(snapshot, delta, Seq("id")).orderBy("id").show(truncate = false)
    val cdc = Seq((1L, "a", 10.0, "D", 1L), (3L, "c2", 33.0, "U", 2L))
      .toDF("id", "name", "v", "op", "seq")
    Merge.applyChanges(Merge.upsert(snapshot, delta, Seq("id")), cdc, Seq("id"))
      .orderBy("id").show(truncate = false)

    println("-- mergeable sketches: distinct counts + quantile telemetry --")
    import graft.ops.Sketch
    val evs = (0 until 1000).map(i => ("day" + (i % 2), "user" + (i % 137), (i * 7 % 500).toLong))
      .toDF("day", "user", "latency")
    Sketch.kmvEstimate(Sketch.kmvSketch(evs, "day", "user", 64), 64)
      .orderBy("key").show(truncate = false)
    Sketch.histQuantiles(Sketch.histSketch(evs, "day", "latency", 5), 5, Seq(50, 99))
      .orderBy("key", "pct").show(truncate = false)

    println("-- vocabulary + token ids (OOV = 0) --")
    val corpus = survivors.orderBy("doc_id").limit(1000)
    val vocab = TextAnalysis.buildVocab(corpus, "text", 100)
    TextAnalysis.encodeTokenIds(corpus.orderBy("doc_id").limit(3), "doc_id", "text", vocab)
      .select(col("doc_id"), slice(col("token_ids"), 1, 10).as("first_10_ids"))
      .show(truncate = false)

    spark.stop()
  }
}
