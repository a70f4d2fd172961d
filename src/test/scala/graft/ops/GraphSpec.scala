package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 1000000000L
  private val BASE = SCALE * 15L / 100L

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

  test("pageRankInt: plan is join + aggregate per iteration — no windows, no cartesian") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val plan = Graph.pageRankInt(edges, "src", "dst", iters = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
