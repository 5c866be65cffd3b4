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
}
