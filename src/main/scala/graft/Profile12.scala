package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** TEMPORARY round-12 optimization profiler — phase breakdowns inside one
  * JVM so host jitter divides out. Not part of any gate; delete at round
  * end if noisy. */
object Profile12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile12")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })

    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def bench(name: String, reps: Int = 3)(mk: => DataFrame): Unit = {
      noop(mk) // warm
      val times = Seq.fill(reps) {
        spark.catalog.clearCache(); System.gc()
        val j0 = jobs.get()
        val t = time(noop(mk))
        val j1 = jobs.get()
        (t, j1 - j0)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      println(f"[prof] $name%-40s med=$med%7.3fs jobs=${times.head._2}%3d  all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    val names = if (args.nonEmpty) args.toSeq else Seq()
    val calib = time(spark.range(50000000L).selectExpr("bit_xor(xxhash64(id))").collect())
    println(f"[prof] calib=$calib%.3f")

    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count()
    val cts = graft.ops.Similarity.vectorsByIds(e, "vec_id", "embedding",
      (0 until 16).map(j => j * n / 16))

    if (names.isEmpty || names.contains("graph")) {
      bench("knnGraph")(
        graft.ops.Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
          maxCell = Int.MaxValue, centroids = Some(cts)))
      val edges = graft.ops.Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        maxCell = Int.MaxValue, centroids = Some(cts))
        .select(col("query_id"), col("neighbor_id"))
      bench("triangles(knn)")(
        graft.ops.Graph.triangleCounts(edges, "query_id", "neighbor_id"))
      val cutEdges = graft.ops.Lineage.cut(edges)
      bench("triangles(cut-knn)")(
        graft.ops.Graph.triangleCounts(cutEdges, "query_id", "neighbor_id"))
      bench("clustering(knn)")(
        graft.ops.Graph.clusteringCoefficients(edges, "query_id", "neighbor_id"))
      bench("clustering(cut-knn)")(
        graft.ops.Graph.clusteringCoefficients(cutEdges, "query_id", "neighbor_id"))
    }

    if (names.contains("tmpab")) {
      // scratch-root A/B via the Paths override seam (the shm-preferring
      // default policy would otherwise make both arms tmpfs)
      val streamQs = Seq("e12_streaming_sessions", "e14_stream_kmv",
        "e15_streaming_bloom_screen", "e09_stream_interval_join")
      val saved = Paths.scratchRootOverride
      try {
        Paths.scratchRootOverride = Some(java.nio.file.Paths.get("/tmp"))
        for (q <- streamQs) bench(s"$q tmp=/tmp")(SparkEntry.queries(q)(spark, sfDir))
        Paths.scratchRootOverride = Some(java.nio.file.Paths.get("/dev/shm"))
        for (q <- streamQs) bench(s"$q tmp=shm")(SparkEntry.queries(q)(spark, sfDir))
      } finally Paths.scratchRootOverride = saved
    }

    if (names.contains("ccrounds")) {
      noop(SparkEntry.queries("s09_components")(spark, sfDir))
    }

    if (names.isEmpty || names.contains("suite")) {
      for (q <- Seq("s13_triangles", "s14_clustering_coeff", "s09_components",
        "s16_hits", "s11_trustrank", "t35_ngram_decontam", "t24_heavy_hitters",
        "p20_perplexity_buckets", "p16_pipeline", "t20_classifier_eval",
        "t10_bigram_plaus", "e14_stream_kmv"))
        bench(q)(SparkEntry.queries(q)(spark, sfDir))
    }
    val calib2 = time(spark.range(50000000L).selectExpr("bit_xor(xxhash64(id))").collect())
    println(f"[prof] calib2=$calib2%.3f")
    spark.stop()
  }
}
