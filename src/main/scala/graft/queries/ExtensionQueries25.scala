package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.io.Tables

/** Round-8 wave: the two r7-verdict follow-ups that complete existing
  * operator families — mergeable HLL distinct sketches (q206, closing the
  * incremental family alongside q153's algebraic merge and q164's
  * histogram merge) and the persisted IVF-PQ ANN index round-trip (q207,
  * the 100 TB serving shape q111's in-session index only simulates). Same
  * contract as every other module: each Spark pipeline pairs with DuckDB
  * oracle SQL replaying it.
  */
object ExtensionQueries25 {

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q206: HLL sketch merge — per-shard approx-distinct PARTIALS merged
    // across base+delta without re-reading raw rows: the base corpus
    // (ts < cutoff) is split into 4 hash shards and the delta
    // (ts >= cutoff) is a 5th, each folded to one DataSketches HLL
    // sketch per event_type (hll_sketch_agg), then hll_union_agg merges
    // the partials and hll_sketch_estimate reads the cardinality off
    // the merged registers. This is the incremental-pipeline shape for
    // distinct counts at 100 TB: each ingest batch persists KB-sized
    // sketches, a refresh merges sketches instead of rescanning history
    // (completing the family: q153 algebraic sums, q164 histogram bins,
    // here cardinalities). The estimate is approximate by construction,
    // so the GATE is a self-audit: the exact per-type distinct (which
    // the oracle replays exactly) plus a within-5%-of-exact boolean the
    // oracle pins to true — lgK=12's relative error is ~1.6%, so 5% is
    // a documented 3-sigma bound; Extension25Spec additionally pins
    // merged==full-recompute estimates. n_partials proves the merge saw
    // every shard.
    Q(
      "q206_hll_merge",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val cutoff = lit("2024-01-22").cast("timestamp_ntz")
        val partials = e
          .select(col("event_type"), col("user_id"),
            when(col("ts") < cutoff, col("event_id") % 4)
              .otherwise(lit(4L)).as("shard"))
          .groupBy("event_type", "shard")
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = partials.groupBy("event_type")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
            count(lit(1)).as("n_partials"))
        val exact = e.groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("exact_users"))
        merged.join(exact, "event_type")
          .select(col("event_type"),
            col("exact_users").cast("long").as("exact_users"),
            col("n_partials").cast("long").as("n_partials"),
            (abs(col("est").cast("double") /
              col("exact_users").cast("double") - 1.0) <= 0.05)
              .as("within_tol"))
          .orderBy("event_type")
      },
      Some("""WITH sh AS (
             |  SELECT event_type, user_id,
             |    CASE WHEN ts < TIMESTAMP '2024-01-22'
             |      THEN event_id % 4 ELSE 4 END AS shard
             |  FROM events)
             |SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  CAST(count(DISTINCT shard) AS BIGINT) AS n_partials,
             |  true AS within_tol
             |FROM sh GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q207: persisted IVF-PQ index round-trip — q111's probes served
    // from the ON-DISK index form: one corpus scan writes (id, codes)
    // hive-partitioned by cell plus constant-size centroid/codebook
    // sidecars (SimilaritySearch.writeIvfPqIndex); the serving path
    // reads the sidecars back, turns the probe set's cells into LITERAL
    // partition predicates, and scans ONLY those cells' directories
    // (PlanSpec pins the PartitionFilters pushdown). Results must be
    // byte-identical to the in-session q111 — same oracle gates both.
    // The localCheckpoint detaches the (tiny) result from the temp
    // index files so the per-invocation index can be deleted eagerly
    // (the q128 temp-dir discipline).
    Q(
      "q207_ivfpq_persisted",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx")
        try {
          SimilaritySearch.writeIvfPqIndex(e, idx.toString,
            nCentroids = 16, m = 8, ksub = 16)
          SimilaritySearch.ivfPqTopKFromIndex(
              e.filter(col("vec_id") < 5), idx.toString, 5, nProbe = 4)
            .orderBy("query_id", "rank")
            .localCheckpoint()
        } finally deleteRecursively(idx)
      },
      Some(ExtensionQueries4.ivfPqOracleSql))
  )
}
