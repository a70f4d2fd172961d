package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs (kNN similarity graphs,
  * link/citation graphs) for training-data curation — centrality as an
  * authority/quality prior, the [[Similarity.knnGraph]] output as the
  * canonical edge source.
  */
object Graph {

  /** PageRank in scaled FIXED-POINT integer arithmetic: ranks start at
    * `scale`, and each iteration computes
    * `rank'(v) = scale·15/100 + 85·Σ_{u→v} (rank(u) div outdeg(u)) / 100`
    * entirely in LONG floor division — no floating point anywhere, so
    * the result is bit-exact under any partitioning AND across engines
    * (the s08 gate has DuckDB reproduce every iteration).
    *
    * Simplified-variant trades, documented: dangling-node mass is
    * dropped (no redistribution) and per-edge floor division truncates
    * up to `outdeg` units of rank — at the default `scale` = 1e9 that
    * perturbs relative ranks by ~1e-9·deg, far below anything a
    * curation ordering can feel. Overflow bound: `n · scale · 85` must
    * stay under 2⁶³ (n ≤ ~10⁸ at the default scale; shrink `scale` for
    * bigger graphs).
    *
    * Shape at 100 TB: per iteration ONE join (edges ⋈ rank on src — the
    * rank side is n rows, broadcast when small) and one hash aggregate
    * by dst with map-side combine; no windows, no driver-side node
    * loops. Every node carries a zero-weight self edge so rows without
    * inbound real edges survive the aggregate with the base rank.
    * `checkpointEvery` truncates lineage for deep iteration counts
    * (iterative plans otherwise grow linearly).
    *
    * @return (node, rank_q) — rank_q in units of 1/`scale` */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, scale: Long = 1000000000L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(scale > 0, "scale must be positive")
    val g = prepGraph(edges, srcCol, dstCol)
    val base = scale * 15L / 100L
    pageRankLoop(g.deg, g.aug, g.nodes.withColumn("rank_q", lit(scale)),
      iters, checkpointEvery) { agg =>
      agg.select(col("node"), expr(s"${base}L + (85 * s) div 100").as("rank_q"))
    }
  }

  /** Normalized edge list plus the two derived tables every propagation
    * variant needs: `nodes` (distinct endpoints), `deg` (out-degrees),
    * `aug` (edges with weight 1 plus zero-weight self edges so nodes
    * without inbound real edges survive each aggregate).
    *
    * All three are materialized ONCE — every iteration's plan
    * references aug and deg, and without the checkpoints each iteration
    * level would embed a fresh copy of the whole upstream computation.
    * [[Lineage.cut]] picks the checkpoint flavor: executor-local by
    * default (edge list held ~twice, e + aug; executor loss fails the
    * job), reliable when a SparkContext checkpoint dir is set. */
  private final case class GraphPrep(nodes: DataFrame, deg: DataFrame,
      aug: DataFrame)

  private def prepGraph(edges: DataFrame, srcCol: String,
      dstCol: String): GraphPrep = {
    val e = Lineage.cut(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = Lineage.cut(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val aug = Lineage.cut(e.withColumn("w", lit(1L)).unionByName(
      nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(0L).as("w"))))
    GraphPrep(nodes, deg, aug)
  }

  /** Personalized PageRank (TrustRank-style) in the same scaled
    * fixed-point arithmetic as [[pageRankInt]]: the restart mass goes
    * ONLY to the seed set — `rank'(v) = [v∈S]·scale·15/100 +
    * 85·Σ_{u→v} (rank(u) div outdeg(u)) / 100`, ranks start at `scale`
    * on seeds and 0 elsewhere. Rank then measures link-proximity to
    * the seeds: with S = a trusted/high-quality document set over a
    * citation or kNN similarity graph, this is the classic curation
    * prior for propagating trust to unlabeled documents. Same
    * bit-exactness, overflow bound and per-iteration shape as
    * [[pageRankInt]], plus one broadcastable join against the per-node
    * base table.
    *
    * @param seeds one column `seedCol` of node ids; ids not present in
    *        the graph are ignored
    * @return (node, rank_q) — rank_q in units of 1/`scale` */
  def personalizedPageRankInt(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iters: Int = 5, scale: Long = 1000000000L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(scale > 0, "scale must be positive")
    val g = prepGraph(edges, srcCol, dstCol)
    val base = scale * 15L / 100L
    // seed-ness comes from the join flag, NOT from base_q > 0 — at tiny
    // scales where scale·15/100 floors to 0 the seeds must still start
    // at rank `scale` or the whole fixed point collapses to zero
    val seeded = Lineage.cut(g.nodes.join(
        seeds.select(col(seedCol).cast("long").as("node")).distinct()
          .withColumn("__seed", lit(1)), Seq("node"), "left")
      .select(col("node"), col("__seed").isNotNull.as("is_seed")))
    val bases = seeded.select(col("node"),
      when(col("is_seed"), lit(base)).otherwise(lit(0L)).as("base_q"))
    val rank0 = seeded.select(col("node"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank_q"))
    pageRankLoop(g.deg, g.aug, rank0, iters, checkpointEvery) { agg =>
      agg.join(bases, Seq("node"))
        .select(col("node"), expr("base_q + (85 * s) div 100").as("rank_q"))
    }
  }

  /** HITS hubs-and-authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) in scaled FIXED-POINT integer
    * arithmetic: per iteration `auth'(v) = Σ_{u→v} hub(u)` then
    * `hub'(u) = Σ_{u→v} auth'(v)`, each half-step max-normalized to
    * `[0, scale]` by `q = raw·scale div max(raw)` — L∞ normalization
    * instead of the textbook L2 (whose sqrt would leave the exact-
    * integer envelope; the iteration converges to the same principal
    * eigenvector direction under any norm, and max-normalization keeps
    * every value an exact LONG, bit-identical under any partitioning
    * AND across engines — the s16 gate has DuckDB reproduce every
    * half-step). On a citation/link graph this separates DIRECTORY
    * pages (high hub) from AUTHORITATIVE pages (high auth) — the
    * curation prior PageRank's single score conflates.
    *
    * Shape at 100 TB: per iteration two narrow equi-joins + two hash
    * aggregates over the augmented edge list (zero-weight self edges
    * keep isolated-direction nodes alive at score 0), plus two 1-row
    * global maxima broadcast back (a scalar-subquery cross join — the
    * documented benign t08 shape). Each normalized half-step is
    * EAGERLY cut ([[Lineage.cut]]) — a normalize embeds its input in
    * BOTH the max-aggregate branch and the value branch, and `auth`
    * feeds both the hub step and the state join, so a lazy chain
    * would re-expand the upstream plan ~6× PER ITERATION (the round-2
    * lazy-max class; pageRankLoop stays lazy only because its state
    * appears exactly once per level). Two cut frames materialize per
    * iteration; superseded ones are reclaimed by the documented
    * [[Lineage]] mechanism (references drop each iteration, the
    * ContextCleaner unpersists on GC — the same lifecycle as
    * [[connectedComponentsStar]]'s two cuts per round).
    * Overflow: raw ≤ maxdeg·scale
    * and the normalize multiplies by `scale` again — `maxdeg·scale² <
    * 2⁶³` is enforced with a typed raise at the normalize (default
    * scale 1e5 → max degree ~9·10⁸; shrink `scale` for denser hubs).
    *
    * @return (node, hub_q, auth_q), each in units of 1/`scale` of that
    *         iteration's maximum */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4, scale: Long = 100000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(scale > 0, "scale must be positive")
    val g = prepGraph(edges, srcCol, dstCol)
    var state = g.nodes.select(col("node"),
      lit(scale).as("hub_q"), lit(scale).as("auth_q"))
    var i = 0
    while (i < iters) {
      val auth = Lineage.cut(lInfNormalize(g.aug
        .join(state.select(col("node").as("src"), col("hub_q")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") * col("hub_q")).as("raw")), scale))
      val hub = Lineage.cut(lInfNormalize(g.aug
        .join(auth.select(col("node").as("dst"), col("q").as("a_q")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("w") * col("a_q")).as("raw")), scale))
      state = hub.select(col("node"), col("q").as("hub_q"))
        .join(auth.select(col("node"), col("q").as("auth_q")), Seq("node"))
      i += 1
    }
    state.select(col("node"), col("hub_q"), col("auth_q"))
  }

  /** Exact L∞ normalization of a (node, raw) frame to `[0, scale]`:
    * `raw·scale div max(raw)` — all-LONG, with a typed raise if the
    * product would overflow (every raw ≤ the max, so guarding the max
    * guards every row) and an all-zero frame passing through as zeros
    * (an edgeless direction must not divide by zero). */
  private def lInfNormalize(raw: DataFrame, scale: Long): DataFrame = {
    val mx = broadcast(raw.agg(coalesce(max(col("raw")), lit(0L)).as("mx")))
    raw.crossJoin(mx).select(col("node"),
      when(col("mx") > lit(Long.MaxValue / scale),
        raise_error(concat(lit("Graph.hitsInt: raw score x scale overflows "),
          lit(s"long (scale=$scale, max raw > ${Long.MaxValue / scale}) - "),
          lit("shrink scale"))).cast("long"))
        .when(col("mx") <= 0L, lit(0L))
        .otherwise(expr(s"(raw * ${scale}L) div mx")).as("q"))
  }

  /** Shared damped-propagation loop: per iteration, contributions
    * `w · (rank div outdeg)` flow along the augmented edge list (zero-
    * weight self edges keep every node alive), are hash-aggregated per
    * destination into `(node, s)`, and `finish` turns that into the
    * next `(node, rank_q)`. */
  private def pageRankLoop(deg: DataFrame, aug: DataFrame, rank0: DataFrame,
      iters: Int, checkpointEvery: Int)(
      finish: DataFrame => DataFrame): DataFrame = {
    var rank = rank0
    var i = 0
    while (i < iters) {
      rank = finish(aug
        .join(rank.select(col("node").as("src"), col("rank_q")), Seq("src"))
        .join(deg.select(col("node").as("src"), col("deg")), Seq("src"), "left")
        .select(col("dst"),
          // deg is NULL only on a dangling node's zero-weight self edge,
          // where w = 0 kills the term; coalesce just avoids NULL div
          (col("w") * expr("rank_q div coalesce(deg, 1L)")).as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("s")))
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        rank = Lineage.cut(rank)
    }
    rank
  }

  /** Connected components by the alternating large-star / small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014): each round rewires edges toward per-node
    * minima, halving component diameter — convergence in O(log n)
    * rounds REGARDLESS of graph shape, where plain min-label
    * propagation needs O(diameter) rounds (a 10⁶-node chain: ~20
    * rounds here vs 10⁶ there). This is the 100 TB path behind
    * [[graft.ops.Dedup.connectedComponents]]'s distributed fallback.
    *
    * Per round: two groupBy-min + join passes over a NARROW (long,
    * long) edge list that only ever shrinks toward one edge per
    * non-root node — no windows, no driver state; [[Lineage.cut]]
    * truncates the iterative lineage (reliable when a SparkContext
    * checkpoint dir is set). Convergence is detected exactly
    * (count equality + `except` emptiness), not by hash checksum.
    *
    * @param pairs edges as (`idA`, `idB`) columns; treated undirected,
    *        self loops ignored
    * @return (id, label) for every id appearing in `pairs`, label =
    *         smallest id in the component */
  def connectedComponentsStar(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 30): DataFrame = {
    // one cut of the raw pair list first: nodes AND the canonical edge
    // list both derive from it — uncut, the whole upstream `pairs`
    // pipeline (a full kNN-graph build for the s09 gate) executed twice
    // (the multi-branch-reference class)
    val p0 = Lineage.cut(pairs.select(col(idA).cast("long").as("a"),
      col(idB).cast("long").as("b")))
    val nodes = Lineage.cut(p0.select(explode(array(col("a"), col("b"))).as("id"))
      .distinct())
    // canonical undirected edges: s < g, deduped, self loops dropped
    var e = Lineage.cut(p0.select(least(col("a"), col("b")).as("s"),
        greatest(col("a"), col("b")).as("g"))
      .filter(col("s") =!= col("g")).distinct())
    var round = 0
    var eCount = e.count()
    var converged = eCount == 0L
    while (!converged && round < maxRounds) {
      // large-star: m(u) = min(N(u) ∪ {u}); every edge (u,v) with
      // v > u is rewired to (m(u), v). m(u) ≤ u < v, so the rewired
      // edge is canonical and never a self loop... unless m(u) = v is
      // impossible; m(u) < v always.
      val bi = e.select(col("s").as("u"), col("g").as("v"))
        .union(e.select(col("g").as("u"), col("s").as("v")))
      val mins = bi.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // persist, not Lineage.cut: ls is read twice WITHIN this round
      // (small-star groupBy + join) but sm's cut below bounds the
      // round-over-round lineage — a cache avoids the recompute at a
      // fraction of a checkpoint's materialization cost, and a lost
      // executor merely recomputes from the checkpointed `e`
      val ls = bi.join(mins, Seq("u")).filter(col("v") > col("u"))
        .select(col("m").as("s"), col("v").as("g"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // small-star on the larger endpoint: u = g has only smaller
      // neighbors here; m(u) = min of them; every smaller neighbor and
      // u itself connect to m(u).
      val m2 = ls.groupBy(col("g")).agg(min(col("s")).as("m"))
      val sm = Lineage.cut(ls.join(m2, Seq("g"))
        .select(col("m").as("s"), col("s").as("g"))
        .filter(col("s") =!= col("g"))
        .union(m2.select(col("m").as("s"), col("g")))
        .distinct())
      // && short-circuits: the except() anti-join only runs once the
      // counts match, i.e. at (or coincidentally near) convergence;
      // the previous round's count carries forward, so most rounds pay
      // ONE count over the just-checkpointed frame
      val smCount = sm.count()
      converged = smCount == eCount && sm.except(e).isEmpty
      ls.unpersist() // sm is materialized (Lineage.cut is eager)
      e = sm
      eCount = smCount
      round += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponentsStar: not converged " +
        s"after $maxRounds rounds; labels may be one rewiring short")
    val labels = e.select(col("g").as("id"), col("s").as("label"))
    // converged stars have exactly one edge per non-root node; an
    // unconverged edge set can still hold several (s, g) per g — keep
    // the one-row-per-id contract by taking the smallest label
    val oneLabel =
      if (converged) labels
      else labels.groupBy(col("id")).agg(min(col("label")).as("label"))
    nodes.join(oneLabel, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Multi-source BFS hop distance over an undirected edge list: for
    * every node reachable from `seeds` within `maxHops`, the MINIMUM
    * hop count to any seed (`(id, hops)`; unreached nodes are omitted,
    * seeds are hop 0). The influence-radius / contamination-spread /
    * quality-propagation primitive the kNN similarity graph serves.
    *
    * Runs EXACTLY synchronous waves with an empty-frontier early stop —
    * idempotent at the fixed point, so an oracle unrolling exactly
    * `maxHops` MATERIALIZED waves matches the early-stop loop (the
    * s15/waterfilling fixed-wave contract). Each wave is one narrow
    * join + anti-join on 8-byte ids; frontiers and the distance table
    * are lineage-cut per wave so the plan stays constant-size (the r2
    * lazy-chain class). Expanding from the FRONTIER (not the whole
    * distance table) keeps wave cost proportional to the wave, not the
    * history — at 100 TB the per-wave shuffle is bounded by the
    * frontier's edge neighborhood. */
  def bfsHops(edges: DataFrame, idA: String, idB: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"bfsHops maxHops must be >= 0, got $maxHops")
    val sym = Lineage.cut(edges
      .select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .union(edges
        .select(col(idB).cast("long").as("a"), col(idA).cast("long").as("b")))
      .filter(col("a") =!= col("b")).distinct())
    var dist = Lineage.cut(seeds.select(col(seedCol).cast("long").as("id"))
      .distinct().withColumn("hops", lit(0)))
    var frontier = dist.select("id")
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val nxt = Lineage.cut(frontier.join(sym, frontier("id") === sym("a"))
        .select(col("b").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("hops", lit(h)))
      if (nxt.isEmpty) done = true
      else {
        dist = Lineage.cut(dist.unionByName(nxt))
        frontier = nxt.select("id")
        h += 1
      }
    }
    dist
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * deterministic variant): every node starts labeled with its own id;
    * each iteration EVERY node simultaneously adopts the most frequent
    * label among its distinct neighbors, ties broken toward the
    * smallest label. Synchronous updates + a total tie order make the
    * result a pure function of (graph, iters) — reproducible at any
    * parallelism, replayable by the DuckDB oracle (gate s12) — where
    * the textbook's asynchronous random-order variant is not.
    *
    * Unlike connected components (one label per reachable set), LPA
    * yields finer communities: dense neighborhoods out-vote bridge
    * edges, so two cliques joined by one edge keep distinct labels.
    *
    * Scale shape: per iteration one equi-join of the NARROW (long,long)
    * edge list against the (long,long) label map and two hash
    * aggregations — count per (node, label), then a single max of
    * struct(count, -label) per node (argmax without a window). Shuffles
    * carry only longs; [[Lineage.cut]] truncates the iterative lineage.
    *
    * @param edges directed or undirected (`srcCol`, `dstCol`) pairs —
    *        symmetrized + deduplicated internally; self loops dropped
    * @return (id, label) for every endpoint; label = the community's
    *         elected id */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4, checkpointEvery: Int = 2): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // every endpoint — including self-loop-only nodes, which vote with
    // nobody but must still appear as label=id singleton communities
    // (same keep-alive convention as pageRankInt's zero-weight selves)
    val allNodes = Lineage.cut(raw.select(col("src").as("id"))
      .union(raw.select(col("dst").as("id"))).distinct())
    val d = raw.filter(col("src") =!= col("dst"))
    val sym = Lineage.cut(
      d.union(d.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    var labels = allNodes.select(col("id"), col("id").as("label"))
    var i = 0
    while (i < iters) {
      val voted = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        // argmax by (count desc, label asc): labels are non-negative
        // ids, so max of struct(cnt, -label) picks highest count then
        // smallest label — one aggregation, no window
        .groupBy(col("dst").as("id"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("top"))
        .select(col("id"), (-col("top.neg")).as("label"))
      labels = allNodes.join(voted, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        labels = Lineage.cut(labels)
    }
    labels
  }

  /** Exact per-node triangle counts over an undirected simple graph —
    * the clustering-coefficient numerator (spam/link-farm detection,
    * community cohesion scoring over the kNN similarity graph).
    *
    * Degree-ordered orientation (Schank–Wagner / Cohen's MapReduce
    * formulation, from the published construction): every undirected
    * edge is directed from its lower-(degree, id) endpoint to the
    * higher, so each triangle {x,y,z} with rank x<y<z materializes
    * EXACTLY once — as the wedge at x (out-edges x→y, x→z) closed by
    * the oriented edge y→z. This is what makes the self-join safe at
    * scale: out-degree under the orientation is O(√m), so wedge volume
    * is bounded by Σ outdeg² = O(m^1.5) — the best known bound for
    * exact counting — instead of Σ deg² (quadratic in the max hub
    * degree, ruinous on power-law graphs). All three joins are narrow
    * (long, long) equi-joins on node keys.
    *
    * @param edges directed or undirected (`srcCol`, `dstCol`) rows —
    *        canonicalized + deduplicated internally; self loops and
    *        null endpoints dropped
    * @return (node, triangles) for every node in ≥1 triangle */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // und/deg feed multiple join branches below — Catalyst does not CSE
    // across branches, so WITHOUT the cuts every branch re-executes the
    // whole upstream `edges` pipeline (for the kNN-graph gates that is
    // the full cell-pair + rank build: measured 4.75 s → 0.94 s on the
    // s13 shape once cut — the r9 HITS plan-blowup class). Materializing
    // m edge rows once is the standard Lineage trade at any scale.
    val und = Lineage.cut(undirectedSimple(edges, srcCol, dstCol))
    orientedTriangles(und, Lineage.cut(degreesOf(und)))
  }

  /** Canonical undirected simple form of an edge list: each edge once as
    * `(a, b)` with `a < b`, self loops and null endpoints dropped. */
  private def undirectedSimple(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val s0 = col(srcCol).cast("long")
    val d0 = col(dstCol).cast("long")
    edges
      .filter(s0.isNotNull && d0.isNotNull && s0 =!= d0)
      .select(least(s0, d0).as("a"), greatest(s0, d0).as("b"))
      .distinct()
  }

  /** Undirected degrees `(n, d)` of a [[undirectedSimple]] edge list.
    * One pass: exploding both endpoints per row replaces the two-branch
    * self-union (which scanned `und` twice). Identical multiset. */
  private def degreesOf(und: DataFrame): DataFrame =
    und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  /** The triangle-count body shared by [[triangleCounts]] and
    * [[clusteringCoefficients]] — see [[triangleCounts]] for the
    * degree-ordered-orientation argument. */
  private def orientedTriangles(und: DataFrame, deg: DataFrame): DataFrame = {
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // orient feeds THREE join branches (two wedge sides + the closing
    // edge) — cut it so the orientation join runs once, not per branch
    val orient = Lineage.cut(und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v")))
    // wedge at u over two DISTINCT out-neighbors; exactly one of the
    // two (v,w) orderings closes (the closing edge is oriented from
    // the lower rank), so no v<w constraint — and no double count
    val wedges = orient
      .join(orient.select(col("u").as("__u2"), col("v").as("w")),
        col("__u2") === col("u") && col("w") =!= col("v"))
      .select(col("u"), col("v"), col("w"))
    val tri = wedges.join(
        orient.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u").as("x"), col("v").as("y"), col("w").as("z"))
    // one pass over tri (explode) instead of a three-branch self-union
    // that would re-run the wedge join per branch; identical multiset
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node over an undirected simple
    * graph: `lcc(v) = triangles(v) / (deg(v)·(deg(v)−1)/2)` — the share
    * of a node's neighbor pairs that are themselves connected. The
    * classic cohesion signal: near 1 on tight communities (and on
    * link-farm cliques), near 0 on hub-and-spoke spam shapes, so it
    * separates organically clustered corpora from manufactured link
    * structure at a glance.
    *
    * Exactness: triangle counts come from [[triangleCounts]]'s
    * degree-ordered orientation (each triangle once, wedge volume
    * O(m^1.5)); wedge pairs `d·(d−1)/2` use LONG integral division (the
    * product is even, so exact); the coefficient is ONE double division
    * of two exactly-converted longs — bit-identical cross-engine (the
    * s14 gate's DuckDB oracle replays it). Degree-1 nodes get 0.0.
    *
    * Shape at 100 TB: the triangle pipeline's three narrow equi-joins
    * plus one left join of the ≤n-row degree table against the ≤n-row
    * triangle table — no new shuffle class over [[triangleCounts]].
    *
    * @return (node, degree, triangles, lcc) for every node with ≥1 edge */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // same multi-branch-reference cuts as [[triangleCounts]]: und feeds
    // deg + orient, deg feeds the orientation joins AND the final left
    // join — uncut, each reference re-executed the full upstream edge
    // build (measured 4.25 s → 0.90 s on the s14 shape)
    val und = Lineage.cut(undirectedSimple(edges, srcCol, dstCol))
    val deg = Lineage.cut(degreesOf(und))
    val tri = orientedTriangles(und, deg)
    val wedges = call_function("div", col("d") * (col("d") - 1), lit(2L))
    deg.join(tri, deg("n") === tri("node"), "left")
      .select(deg("n").as("node"), col("d").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          coalesce(col("triangles"), lit(0L)).cast("double") /
            wedges.cast("double"))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** k-core peeling over an undirected simple graph: repeatedly delete
    * nodes of degree < k (each wave recomputes degrees over the surviving
    * subgraph) until a fixed point — the surviving nodes form the k-core,
    * the standard "dense cohesive subgraph" extractor (community cores,
    * spam-ring detection, robust-seed selection for TrustRank).
    *
    * Runs at most `maxWaves` peel waves, stopping early when a wave
    * deletes nothing; with `maxWaves` large enough this is the exact
    * k-core. A FIXED wave count is also a determinism contract: the
    * result after exactly j waves is well-defined (peeling is confluent —
    * each wave's deletions depend only on the previous subgraph), which
    * is what the s15 gate's DuckDB oracle replays wave-for-wave even if
    * unconverged.
    *
    * Shape at 100 TB: each wave is one hash aggregate (degrees, map-side
    * combined) + two semi-joins of the edge list against the ≤n-row
    * survivor set — no windows, no driver-side node state; the edge list
    * passes through [[Lineage.cut]] every wave so the iterative plan
    * stays linear. The loop is driver-coordinated but each wave's
    * convergence check is a cheap count on the ≤n-row degree table.
    *
    * @return (node, degree) of the surviving subgraph — degree WITHIN
    *         the core, every survivor has degree ≥ k (unless `maxWaves`
    *         ran out, in which case the last wave's subgraph is returned)
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxWaves: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxWaves >= 1, "maxWaves must be >= 1")
    val e = peelToCore(
      Lineage.cut(undirectedSimple(edges, srcCol, dstCol)), k, maxWaves)
    degreesOf(e).select(col("n").as("node"), col("d").as("degree"))
  }

  /** The peel loop shared by [[kCore]] and [[coreness]]: delete
    * degree<k nodes wave-by-wave over a [[undirectedSimple]] edge list
    * (already lineage-cut by the caller) until a fixed point or
    * `maxWaves`; returns the surviving (cut) edge list. */
  private def peelToCore(edges: DataFrame, k: Int, maxWaves: Int): DataFrame = {
    var e = edges
    var deg = degreesOf(e).persist()
    var dropped = deg.filter(col("d") < k).count()
    var waves = 0
    while (dropped > 0 && waves < maxWaves) {
      val keep = deg.filter(col("d") >= k).select(col("n"))
      e = Lineage.cut(e
        .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      deg.unpersist()
      deg = degreesOf(e).persist()
      dropped = deg.filter(col("d") < k).count()
      waves += 1
    }
    if (dropped > 0)
      // long-path graphs peel one node per wave: a silent exhaustion
      // would make the returned subgraph a superset of the true k-core
      // (and inflate coreness labels downstream) — warn like
      // connectedComponentsStar's unconverged exit
      System.err.println(s"[graft] kCore: maxWaves=$maxWaves exhausted " +
        s"before the $k-core converged ($dropped nodes still below k) — " +
        "the result is a SUPERSET of the true core; raise maxWaves")
    deg.unpersist()
    e
  }

  /** Full core decomposition: the core number of every node — the
    * largest k such that the node survives k-core peeling. The standard
    * graph-curation prior one level up from [[kCore]]: degeneracy
    * ordering, "how deep in the dense part of the web/citation/kNN
    * graph does this document sit".
    *
    * Algorithm: peel to the (k+1)-core for k = 1, 2, …; nodes present
    * in the k-core but gone from the (k+1)-core have core number
    * exactly k. The outer loop runs `degeneracy(G)` rounds (single
    * digits on sparse corpus graphs; bounded by `maxK` against
    * adversarial near-cliques — survivors past `maxK` are reported AS
    * `maxK`, a documented lower bound). Each round is the [[kCore]]
    * wave loop; per-round results are ≤n-row (node, coreness) frames
    * accumulated by union with lineage cut every round, so the plan
    * stays linear in rounds.
    *
    * @return (node, coreness) for every node with ≥1 edge; coreness is
    *         exact below `maxK` and clamped at `maxK` above it */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int = 64, maxWaves: Int = 1000): DataFrame = {
    require(maxK >= 1, "maxK must be >= 1")
    require(maxWaves >= 1, "maxWaves must be >= 1")
    val spark = edges.sparkSession
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("node", LongType), StructField("coreness", IntegerType)))
    var result = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def nodesOf(g: DataFrame) = g.select(col("a").as("node"))
      .union(g.select(col("b").as("node"))).distinct()
    var e = Lineage.cut(undirectedSimple(edges, srcCol, dstCol))
    // carried across rounds: round k's survivor set is round k+1's
    // start set, so each distinct runs once, not twice
    var curNodes = Lineage.cut(nodesOf(e))
    var k = 1
    var empty = e.isEmpty
    while (!empty && k <= maxK) {
      val next =
        if (k == maxK) e.limit(0) // clamp: report survivors as maxK
        else peelToCore(e, k + 1, maxWaves)
      val nextNodes = Lineage.cut(nodesOf(next))
      val droppedNodes = curNodes.join(nextNodes, Seq("node"), "left_anti")
        .select(col("node"), lit(k).as("coreness"))
      result = Lineage.cut(result.unionByName(droppedNodes))
      e = next
      curNodes = nextNodes
      empty = e.isEmpty
      k += 1
    }
    result
  }
}
