package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed as DataFrame joins — the same
  * "iteration = a fixed pipeline of keyed shuffles" shape as
  * [[Dedup.canonicalize]]'s connected components. The reference has no
  * graph operators; these belong to the LLM-pipeline extension surface
  * (ranking inside near-dup evidence graphs: which document is the
  * "authority" of its duplication cluster).
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list.
    *
    * Each iteration is exactly two keyed shuffles at any scale — a join
    * of the (src, dst, deg) edge table with the current ranks on `src`,
    * then an aggregation on `dst` — i.e. the Pregel/GraphX recurrence as
    * declarative Spark, with no driver-side state beyond the node count.
    * The edge table (with degrees) is materialized ONCE via
    * `localCheckpoint` and reused every round; per-round ranks are also
    * checkpointed so lineage stays O(1) instead of O(iters) (swap for
    * `checkpoint` on a cluster with a checkpoint dir).
    *
    * Dangling-node mass is NOT redistributed (the common simplification):
    * with `undirected = true` (the near-dup-graph case) every node has
    * out-edges, so no mass is lost and ranks sum to 1.
    *
    * Float determinism for the oracle gate: every constant is derived
    * with the same double arithmetic the oracle SQL spells out
    * (`1.0 - damping`, `x / n`), so the only cross-engine divergence is
    * summation order — last-ulp noise the caller's stableRound6 absorbs.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
               undirected: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    val e0 = edges.select(col(edges.columns(0)).cast("long").as("src"),
      col(edges.columns(1)).cast("long").as("dst"))
    val e = (if (undirected) e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
             else e0).localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    require(n > 0, "pageRank: empty graph")
    val teleport = (1.0 - damping) / n
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")), "src")
      .localCheckpoint() // reused every iteration: never recompute degrees
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("m"))
        .select(col("dst").as("node"),
          (lit(teleport) + lit(damping) * col("m")).as("rank"))
      // a node with no in-edges receives only teleport mass (cannot occur
      // on an undirected graph, kept for directed generality)
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), coalesce(col("rank"), lit(teleport)).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Multi-source BFS hop distances, capped at `maxHops` rounds — the
    * "blast radius" primitive (taint propagation through a similarity
    * graph, contamination reach, recall expansion). Classic frontier
    * BFS as keyed joins: each round expands the frontier through the
    * edge list (one shuffle on `src`), anti-joins already-visited nodes
    * (one shuffle on `node`), and checkpoints — lineage stays O(1), and
    * the left-anti visit set guarantees first-reach = minimum hop count,
    * so results are partitioning-invariant. Terminates early when a
    * frontier empties (the `isEmpty` probe is one cheap job on a frame
    * that is already checkpointed). Per-round state is the visited set —
    * node-count bounded, never edges × rounds.
    *
    * @param edges    directed (src, dst) rows — symmetrize before the
    *                 call for an undirected walk
    * @param sources  one column of seed node ids (hop 0)
    * @return (node LONG, hops INT) — nodes unreachable in maxHops are
    *         absent
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      s"maxHops must be in [1, 64], got $maxHops")
    val e = edges.select(col(edges.columns(0)).cast("long").as("src"),
      col(edges.columns(1)).cast("long").as("dst")).localCheckpoint()
    var visited = sources
      .select(col(sources.columns(0)).cast("long").as("node")).distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint()
    var frontier = visited.select("node")
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.unionAll(next).localCheckpoint()
        frontier = next.select("node")
        hop += 1
      }
    }
    visited
  }
}
