package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 1000000000L
  private val BASE = SCALE * 15L / 100L

  test("labelPropagation: cliques absorb their members; a bridge does not merge them") {
    // two triangles {1,2,3} and {10,11,12} joined by bridge 3-10: LPA
    // must keep two communities (dense votes beat the single bridge),
    // where connected components would collapse them into one
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val got = Graph.labelPropagation(
        edges.union(Seq((50L, 50L)).toDF("a", "b")), "a", "b", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
    assert(got(1L) != got(10L), "bridge must not merge the two cliques")
    // a self-loop-only node is kept as its own singleton community
    assert(got(50L) == 50L)
    // components DO merge them — LPA is strictly finer here
    val comp = Graph.connectedComponentsStar(
      edges.select(col("a").as("id_a"), col("b").as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == comp(12L))
  }

  test("labelPropagation: deterministic under partitioning and checkpoint cadence") {
    val edges = (1L to 40L).flatMap(i => Seq((i, (i % 8) + 100L), (i, ((i + 3) % 8) + 100L)))
      .toDF("a", "b")
    def run(parts: Int, ckpt: Int) =
      Graph.labelPropagation(edges.repartition(parts), "a", "b",
          iters = 4, checkpointEvery = ckpt)
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(1, 2) == run(13, 2))
    assert(run(13, 2) == run(13, 1))
  }

  test("pageRankInt: one iteration on a star matches hand arithmetic") {
    // 1→3, 2→3 ; 3 dangling
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRankInt(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // sources receive nothing: base + 85*0/100
    assert(r(1L) == BASE && r(2L) == BASE)
    // hub: base + 85*(scale/1 + scale/1)/100
    assert(r(3L) == BASE + 85L * (SCALE + SCALE) / 100L)
  }

  test("pageRankInt: iteration 2 propagates through a chain, dangling mass drops") {
    // 1→2→3
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.pageRankInt(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1(2L) == BASE + 85L * SCALE / 100L)
    val r2 = Graph.pageRankInt(edges, "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // node 3 receives node 2's ITERATION-1 rank
    assert(r2(3L) == BASE + 85L * r1(2L) / 100L)
    assert(r2(1L) == BASE)
  }

  test("pageRankInt: deterministic under partitioning; checkpointEvery changes nothing") {
    val edges = (0L until 200L).map(i => (i, (i * 7 + 3) % 200)).toDF("src", "dst")
    def run(parts: Int, ck: Int) =
      Graph.pageRankInt(edges.repartition(parts), "src", "dst", iters = 4,
          checkpointEvery = ck)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(1, 0)
    assert(run(7, 0) == a)
    assert(run(7, 2) == a)
  }

  test("reliable checkpointing: a SparkContext checkpoint dir changes no result") {
    // Lineage.cut switches every iterative op from localCheckpoint to
    // reliable .checkpoint() when a checkpoint dir is set — the 100 TB
    // deployment flag. Results must be identical either way.
    val edges = (0L until 100L).map(i => (i, (i * 7 + 3) % 100)).toDF("src", "dst")
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vecs = (0L until 40L).map(i =>
      (i, Array((i % 4).toDouble, (i % 3).toDouble))).toDF("id", "v")
    def all() = (
      Graph.pageRankInt(edges, "src", "dst", iters = 3, checkpointEvery = 1)
        .orderBy("node").collect().toSeq,
      Graph.connectedComponentsStar(pairs)
        .orderBy("id").collect().toSeq,
      Clustering.kmeans(vecs, "id", "v", k = 3, iters = 2)._1
        .orderBy("id").collect().toSeq)
    val local = all()
    val dir = tmpDir("graft-ckpt")
    val sc = spark.sparkContext
    try {
      sc.setCheckpointDir(dir.toString)
      assert(all() == local)
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      assert(wrote, "no reliable checkpoint data written under the configured dir")
      // explicit override: reliable=false keeps localCheckpoint even with a dir
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
      assert(all() == local)
    } finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
      sc.setCheckpointDir(null)
    }
  }

  test("hitsInt: directory nodes score hub, referenced nodes score auth; exact arithmetic") {
    // 1 and 2 point at every member of {10, 11, 12}; 3 points only at 10
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 10L)).toDF("src", "dst")
    val r = Graph.hitsInt(edges, "src", "dst", iters = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val scale = 100000L
    // pure hubs: max hub score for 1 and 2, zero authority
    assert(r(1L) == ((scale, 0L)) && r(2L) == ((scale, 0L)), s"$r")
    // 3 points at one authority only: positive but smaller hub
    assert(r(3L)._1 > 0L && r(3L)._1 < scale && r(3L)._2 == 0L, s"${r(3L)}")
    // 10 has three in-links (max authority), 11/12 two each, equal
    assert(r(10L)._2 == scale && r(11L)._2 == r(12L)._2 &&
      r(11L)._2 > 0L && r(11L)._2 < scale, s"$r")
    // pure authorities never act as hubs
    assert(Seq(10L, 11L, 12L).forall(n => r(n)._1 == 0L), s"$r")
    // exact half-step check after one iteration: auth1 raw = in-hub
    // sums (3,2,2) -> normalized (scale, 2*scale/3, 2*scale/3); hub1
    // raw for node 3 = auth(10) = scale vs node 1/2 raw = scale +
    // 2*(2*scale/3); replay the integer arithmetic literally
    val one = Graph.hitsInt(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val a11 = 2L * scale * scale / (3L * scale) // (2*scale)*scale div (3*scale)
    assert(one(11L)._2 == a11, s"${one(11L)} vs $a11")
    val h1raw = scale + 2L * a11
    assert(one(3L)._1 == scale * scale / h1raw, s"${one(3L)}")
    // determinism under partitioning (half-steps are eagerly cut)
    val again = Graph.hitsInt(edges.repartition(7), "src", "dst", iters = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(again == r)
    // overflow guard: a scale whose square can't fit raises loudly
    // the eager half-step cut surfaces the raise at call time
    val boom = intercept[RuntimeException] {
      Graph.hitsInt(edges, "src", "dst", iters = 1, scale = 4000000000L)
        .collect()
    }
    assert(boom.getMessage.contains("hitsInt"), boom.getMessage)
  }

  test("personalizedPageRankInt: restart mass reaches only seeds; trust propagates by hops") {
    // 1→2→3, seed {1}; ids 99 in seeds but not in graph must be ignored
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("node")
    def run(n: Int) = Graph.personalizedPageRankInt(edges, "src", "dst",
        seeds, "node", iters = n)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r1 = run(1)
    assert(r1(1L) == BASE)                       // seed: base, no inbound
    assert(r1(2L) == 85L * SCALE / 100L)         // non-seed: no base term
    assert(r1(3L) == 0L)                         // two hops away after 1 iter
    assert(!r1.contains(99L))
    val r2 = run(2)
    assert(r2(3L) == 85L * r1(2L) / 100L)        // trust arrives at hop 2
    assert(r2(2L) == 85L * r1(1L) / 100L)
  }

  test("personalizedPageRankInt: seeds stay alive when scale*15/100 floors to 0") {
    // scale = 5 → base = 0; seed-ness must come from the seed flag, not
    // base_q > 0, or the fixed point collapses to all zeros
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.personalizedPageRankInt(edges, "src", "dst", seeds,
        "node", iters = 1, scale = 5L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) == 85L * 5L / 100L)             // = 4: propagation survived
    assert(r(1L) == 0L)                          // base quantized away, ok
  }

  test("bfsHops: multi-source minimum, hop cap, unreached omitted, early stop idempotent") {
    // path 1-2-3-4-5, plus disconnected 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    def run(seeds: Seq[Long], k: Int) =
      Graph.bfsHops(edges, "id_a", "id_b", seeds.toDF("s"), "s", k)
        .as[(Long, Int)].collect().toMap
    assert(run(Seq(1L), 4) === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(run(Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    // multi-source takes the MINIMUM hop distance
    assert(run(Seq(1L, 5L), 4) === Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
    // maxHops beyond the fixed point: early stop, identical answer
    assert(run(Seq(1L), 30) === run(Seq(1L), 4))
    // a seed outside the graph reaches nothing but reports itself
    assert(run(Seq(99L), 3) === Map(99L -> 0))
    assert(run(Seq(10L), 4) === Map(10L -> 0, 11L -> 1))
  }

  test("connectedComponentsStar: matches union-find on adversarial shapes") {
    // chain of 120 (diameter stress: label propagation would need 120
    // rounds, star converges in O(log)), two cliques, a star, isolated
    // self-loop node, plus random edges — all in one graph
    val chain = (0L until 119L).map(i => (i, i + 1))
    val clique1 = for (a <- 200L to 205L; b <- 200L to 205L if a < b) yield (a, b)
    val clique2 = for (a <- 300L to 310L; b <- 300L to 310L if a < b) yield (a, b)
    val star = (401L to 420L).map(x => (400L, x))
    val self = Seq((500L, 500L))
    val rnd = (0 until 80).map { i => ((i * 37 + 11) % 60 + 600L, (i * 53 + 29) % 60 + 600L) }
    val pairs = (chain ++ clique1 ++ clique2 ++ star ++ self ++ rnd)
      .toDF("id_a", "id_b")
    val got = Graph.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // oracle: in-test union-find
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    pairs.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // relabel union-find roots to component minima before comparing
    val ids = parent.keys.toSeq
    val minOfRoot = ids.groupBy(find).map { case (r, xs) => r -> xs.min }
    val want = ids.map(id => id -> minOfRoot(find(id))).toMap
    assert(got == want)
    assert(got(500L) == 500L)          // self-loop-only node labels itself
    assert(got(119L) == 0L)            // chain end reaches the chain min
  }

  test("connectedComponentsStar: unconverged exit still yields one row per id") {
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Graph.connectedComponentsStar(chain, maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 201 && out.map(_._1).distinct.length == 201)
    assert(out.forall { case (id, label) => label <= id })
  }

  test("connectedComponentsStar: empty input and single edge") {
    assert(Graph.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    val one = Graph.connectedComponentsStar(Seq((7L, 3L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(3L -> 3L, 7L -> 3L))
  }

  test("Dedup.connectedComponents distributed fallback routes to star and matches driver path") {
    val pairs = ((0L until 40L).map(i => (i, i + 1)) ++ Seq((90L, 91L)))
      .toDF("id_a", "id_b")
    val driver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == driver)
  }

  test("triangleCounts: known shapes, input canonicalization, brute-force cross-check") {
    def counts(edges: Seq[(Long, Long)]) =
      Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: 4 triangles, every node in exactly 3
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // path graph: no triangles at all → empty result
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // canonicalization: duplicates, reversed directions and self loops
    // collapse to one undirected triangle
    assert(counts(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // brute force on a deterministic pseudo-random graph: per-node
    // membership over all C(n,3) id triples must match exactly
    val n = 40
    val rndEdges = (for (i <- 0 until n; j <- 0 until n if i < j)
      yield (i.toLong, j.toLong)).filter { case (i, j) =>
        (i * 2654435761L + j * 40503L) % 7 == 0 }
    val es = rndEdges.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (x <- 0L until n; y <- x + 1 until n; z <- y + 1 until n)
      if (es((x, y)) && es((x, z)) && es((y, z))) {
        brute(x) += 1; brute(y) += 1; brute(z) += 1
      }
    assert(counts(rndEdges) == brute.toMap, "distributed != brute force")
  }

  test("pageRankInt: plan is join + aggregate per iteration — no windows, no cartesian") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val plan = Graph.pageRankInt(edges, "src", "dst", iters = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("clusteringCoefficients: known shapes and the brute-force graph") {
    def lccs(edges: Seq[(Long, Long)]) =
      Graph.clusteringCoefficients(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // triangle + pendant at node 1: node 1 has degree 3, 1 triangle,
    // 3 neighbor pairs → 1/3; nodes 2,3 are fully clustered; pendant 4
    // has degree 1 → lcc 0 by convention
    val got = lccs(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(2L) == ((2L, 1L, 1.0)) && got(3L) == ((2L, 1L, 1.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))
    // K4: every node degree 3, 3 triangles, lcc exactly 1
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(lccs(k4).values.toSet == Set((3L, 3L, 1.0)))
    // star: hub clusters nothing, leaves have degree 1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    assert(lccs(star)(0L) == ((3L, 0L, 0.0)))
    // brute force: lcc must equal triangles/(d choose 2) on the same
    // pseudo-random graph the triangle spec cross-checks
    val n = 30
    val rndEdges = (for (i <- 0 until n; j <- 0 until n if i < j)
      yield (i.toLong, j.toLong)).filter { case (i, j) =>
        (i * 2654435761L + j * 40503L) % 5 == 0 }
    for ((node, (d, tri, lcc)) <- lccs(rndEdges)) {
      val wedges = d * (d - 1) / 2
      val expect = if (d >= 2) tri.toDouble / wedges.toDouble else 0.0
      assert(lcc == expect, s"node $node: lcc $lcc != $expect")
    }
  }

  test("kCore: peels to the exact core, early-stops, respects maxWaves") {
    def core(edges: Seq[(Long, Long)], k: Int, waves: Int = 100) =
      Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, waves)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 with a tail 4-5-6: the 3-core is exactly the K4 (tail and its
    // attachment edges peel away over two waves)
    val k4 = (for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j))
    val g = k4 ++ Seq((3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(g, 3) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k above max degree: everything peels
    assert(core(g, 5).isEmpty)
    // k=1 keeps every non-isolated node
    assert(core(g, 1).keySet == (0L to 6L).toSet)
    // cascade needs >1 wave: a chain peels one end per wave at k=2;
    // maxWaves=1 leaves the intermediate state (only wave-1 deletions)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(core(chain, 2).isEmpty, "chain has no 2-core")
    val oneWave = core(chain, 2, waves = 1)
    assert(oneWave.keySet == Set(2L, 3L, 4L), s"wave-1 state: $oneWave")
    // canonicalization: reversed/duplicate/self-loop edges collapse
    assert(core(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L)), 2)
      == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("coreness: exact core numbers, brute-force cross-check, maxK clamp") {
    def cores(edges: Seq[(Long, Long)], maxK: Int = 64) = {
      val rows = Graph.coreness(edges.toDF("src", "dst"), "src", "dst", maxK)
        .collect().map(r => r.getLong(0) -> r.getInt(1))
      // one row per node — a duplicate-label bug must not hide in .toMap
      assert(rows.map(_._1).distinct.length == rows.length,
        s"duplicate coreness rows: ${rows.toSeq}")
      rows.toMap
    }
    // peel-mirroring brute force: for k = 1, 2, … peel to the
    // (k+1)-core; nodes dropped from the k-core have core number k
    def brute(es: Seq[(Long, Long)]): Map[Long, Int] = {
      var edges = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(p => p._1 != p._2).toSet
      var res = Map.empty[Long, Int]
      var k = 1
      while (edges.nonEmpty) {
        var cur = edges
        var changed = true
        while (changed) {
          val deg = cur.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (n, l) => n -> l.size }
          val keep = deg.filter(_._2 >= k + 1).keySet
          val nxt = cur.filter(p => keep(p._1) && keep(p._2))
          changed = nxt != cur
          cur = nxt
        }
        val dropped = edges.flatMap(p => Seq(p._1, p._2)) --
          cur.flatMap(p => Seq(p._1, p._2))
        dropped.foreach(n => res += n -> k)
        edges = cur
        k += 1
      }
      res
    }
    // K4 + tail: clique nodes sit in the 3-core, the chain in the 1-core
    val k4 = (for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j))
    val g = k4 ++ Seq((3L, 4L), (4L, 5L), (5L, 6L))
    assert(cores(g) == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3,
      4L -> 1, 5L -> 1, 6L -> 1))
    // triangle + pendant
    assert(cores(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
      == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1))
    // brute force on the pseudo-random graph the other graph specs use
    val n = 30
    val rndEdges = (for (i <- 0 until n; j <- 0 until n if i < j)
      yield (i.toLong, j.toLong)).filter { case (i, j) =>
        (i * 2654435761L + j * 40503L) % 5 == 0 }
    assert(cores(rndEdges) == brute(rndEdges), "distributed != brute force")
    // maxK clamp: K4's true coreness is 3; at maxK=2 the clique reports
    // the documented lower bound while the tail stays exact
    assert(cores(g, maxK = 2) == Map(0L -> 2, 1L -> 2, 2L -> 2, 3L -> 2,
      4L -> 1, 5L -> 1, 6L -> 1))
    // consistency: nodes with coreness >= k are exactly kCore(k)'s survivors
    val c = cores(rndEdges)
    val k3 = Graph.kCore(rndEdges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(_.getLong(0)).toSet
    assert(c.filter(_._2 >= 3).keySet == k3)
  }
}
