package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

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
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)   // sum of task run times
    val deserMs = new AtomicLong(0L)  // sum of task deserialization times
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(te.taskMetrics).foreach { m =>
          taskMs.addAndGet(m.executorRunTime)
          deserMs.addAndGet(m.executorDeserializeTime)
          gcMs.addAndGet(m.jvmGCTime)
        }
        ()
      }
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
      println(f"[prof] $name%-40s med=$med%7.3fs jobs=${times.map(_._2).mkString("/")}  all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    // fail fast on unknown block names — a typo would otherwise run only
    // the two calib probes and exit looking successful (the same
    // silent-unknown-arg class ScaleProbe was fixed for in r12)
    val knownBlocks = Set("graph", "tmpab", "ccrounds", "suite", "stream", "streamw", "aqeab", "jobtrace", "cheap", "cacheaqe")
    val names = if (args.nonEmpty) args.toSeq else Seq()
    val unknown = names.filterNot(knownBlocks)
    require(unknown.isEmpty,
      s"Profile12: unknown block(s) ${unknown.mkString(", ")}; known: ${knownBlocks.toSeq.sorted.mkString(", ")}")
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

    // round-13: streaming-gate anatomy — wall vs summed task time vs
    // scheduler machinery, to find where the e-gates' fixed cost sits at
    // high core counts (BENCH_r12 showed them 2-5x slower at cpus=32 than
    // cpus=8 on the driver's scaling run).
    def anatomy(name: String, reps: Int = 2)(mk: => DataFrame): Unit = {
      noop(mk) // warm
      for (i <- 1 to reps) {
        spark.catalog.clearCache(); System.gc()
        val (j0, s0, t0, tm0, d0, g0) =
          (jobs.get, stages.get, tasks.get, taskMs.get, deserMs.get, gcMs.get)
        val w = time(noop(mk))
        println(f"[prof] $name%-28s rep$i wall=$w%7.3fs jobs=${jobs.get - j0}%4d stages=${stages.get - s0}%4d tasks=${tasks.get - t0}%5d " +
          f"taskSum=${(taskMs.get - tm0) / 1e3}%7.2fs deser=${(deserMs.get - d0) / 1e3}%6.2fs gc=${(gcMs.get - g0) / 1e3}%5.2fs")
      }
    }
    if (names.contains("stream")) {
      for (q <- Seq("e09_stream_interval_join", "e12_streaming_sessions",
        "e15_streaming_bloom_screen", "e19_stream_lm_screen",
        "e13_stream_outer_join", "e03_streaming_tumbling",
        "e22_stream_embed_screen", "e11_streaming_cdc",
        "e21_stream_media_screen", "e25_stream_entity_screen"))
        anatomy(q)(SparkEntry.queries(q)(spark, sfDir))
    }
    if (names.contains("aqeab")) {
      // A/B: AQE on (ambient default) vs off for the job-count-dominated
      // screen gates — AQE materializes every exchange as its own
      // stage-job, which on tiny per-batch frames is pure driver latency
      val qs = Seq("s09_components", "s12_label_prop", "s16_hits",
        "e17_stream_drift", "e25_stream_entity_screen", "e21_stream_media_screen")
      for (q <- qs) {
        anatomy(s"$q aqe=on")(SparkEntry.queries(q)(spark, sfDir))
        // off arm ALSO narrows the ambient width: without AQE the gates'
        // setup writes (index builds at ambient shuffle partitions) lose
        // AQE coalescing, which is what ballooned the first off-arm A/B
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try anatomy(s"$q aqe=off+p8")(SparkEntry.queries(q)(spark, sfDir))
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
      }
    }
    if (names.contains("cacheaqe")) {
      // A/B: allow AQE to re-partition cached plans — default false means
      // every .persist() materializes exchanges at the RAW shuffle width
      // (32 tiny tasks per cached exchange at cpus=32, no coalescing)
      println("[prof] canChangeCachedPlanOutputPartitioning default = " +
        scala.util.Try(spark.conf.get(
          "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")).getOrElse("<unset>"))
      val qs = Seq("e19_stream_lm_screen", "e21_stream_media_screen",
        "e25_stream_entity_screen", "e22_stream_embed_screen",
        "e15_streaming_bloom_screen", "t20_classifier_eval")
      // the session builder now sets the conf TRUE: the off arm must set
      // false explicitly, and the block restores true afterwards so later
      // blocks in the same invocation measure under the builder default
      // (review finding: the first A/B's "off" arm ran with it on, and
      // the finally leaked "false" into subsequent blocks)
      try {
        for (q <- qs) {
          spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
          anatomy(s"$q cachedAqe=off")(SparkEntry.queries(q)(spark, sfDir))
          spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
          anatomy(s"$q cachedAqe=on")(SparkEntry.queries(q)(spark, sfDir))
        }
      } finally spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    }
    if (names.contains("jobtrace")) {
      // one execution of a gate with every job's callsite printed —
      // finds WHERE a job-count-dominated gate's driver round trips live
      val traced = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val names = js.stageInfos.map(si => s"${si.name}(${si.numTasks})").mkString(" | ")
          traced.add(f"[prof] job ${js.jobId}%4d stages=${js.stageInfos.size}%2d $names")
          ()
        }
      })
      val q = sys.env.getOrElse("SPARK_GRAFT_TRACE_QUERY", "e21_stream_media_screen")
      noop(SparkEntry.queries(q)(spark, sfDir)) // warm
      traced.clear()
      val w = time(noop(SparkEntry.queries(q)(spark, sfDir)))
      println(f"[prof] $q traced wall=$w%.3f")
      traced.forEach(l => println(l))
    }
    if (names.contains("cheap")) {
      for (q <- Seq("q01_pricing_agg", "q10_topk_offset", "t01_token_counts",
        "d07_simhash_bands", "p02_stratified_sample", "src_csv_roundtrip",
        "q03_join_revenue", "m01_insert", "s01_ann_topk", "t21_kmv_sketch"))
        anatomy(q)(SparkEntry.queries(q)(spark, sfDir))
    }
    if (names.contains("streamw")) {
      // batch-query anatomy at ambient width (anti-scaling suspects)
      for (q <- Seq("p20_perplexity_buckets", "t40_dup_span_excise",
        "t16_dup_span_merge", "s09_components", "t24_heavy_hitters",
        "s12_label_prop", "s16_hits", "e17_stream_drift",
        "e20_stream_dsir_screen", "t32_postings_search", "s04_ann_ivfpq"))
        anatomy(q)(SparkEntry.queries(q)(spark, sfDir))
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
