package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling}
import graft.io.{Sources, Tables}

/** Round-10 first wave — new-primitive content only (the r9 "no pure
  * stat-wave growth" rule): q458 introduces BUCKETED-TABLE STORAGE (the
  * first `bucketBy` in the engine — shuffle-free co-located joins on a
  * pre-bucketed key), q459 the PERSISTED MinHash BAND INDEX (write-once
  * + incremental append + serve, closing the "ANN has an index, dedup
  * recomputes" gap). Each pairs with a DuckDB oracle replaying the
  * logical result from the raw parquet — storage layout is transparent
  * to semantics, which is precisely what the oracle proves.
  */
object ExtensionQueries80 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q458: co-located join over pre-bucketed tables — the storage
    // feature every 100 TB deployment uses for a repeatedly-joined key:
    // both per-user aggregates are persisted `bucketBy(8, user_id)` +
    // per-bucket sorted (Sources.writeBucketed), so the join reads
    // bucket i against bucket i with ZERO exchange on either side (the
    // scan satisfies the join's required distribution; pinned in
    // PlanSpec). The merge hint pins the SMJ shape the bucketing
    // exists for — at catalog scale neither side broadcasts anyway.
    // The oracle computes the same join from raw events: bucketing is
    // a physical layout, not a semantic change.
    Q(
      "q458_bucketed_colocated_join",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val base =
          s"${System.getProperty("java.io.tmpdir")}/graft_buckets$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"),
            col("event_type"))
        val stats = ev.groupBy("user_id").agg(
          count(lit(1)).cast("long").as("n_events"),
          sum("cents").as("total_cents"))
        val purch = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(
            count(lit(1)).cast("long").as("n_purchases"),
            sum("cents").as("purchase_cents"))
        Sources.writeBucketed(stats, s"graft_ustats$tag",
          s"$base/ustats", 8, "user_id")
        Sources.writeBucketed(purch, s"graft_upurch$tag",
          s"$base/upurch", 8, "user_id")
        s.table(s"graft_ustats$tag").hint("merge")
          .join(s.table(s"graft_upurch$tag"), "user_id")
          .select(col("user_id"), col("n_events"), col("total_cents"),
            col("n_purchases"), col("purchase_cents"))
          .orderBy(col("purchase_cents").desc, col("user_id"))
          .limit(100)
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             |    event_type
             |  FROM events),
             |stats AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(cents) AS BIGINT) AS total_cents
             |  FROM ev GROUP BY 1),
             |purch AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             |    CAST(sum(cents) AS BIGINT) AS purchase_cents
             |  FROM ev WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT user_id, n_events, total_cents, n_purchases,
             |  purchase_cents
             |FROM stats JOIN purch USING (user_id)
             |ORDER BY purchase_cents DESC, user_id
             |LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    // q459: near-dup serve from the PERSISTED band index — q66's
    // incremental dedup re-expressed the way a standing pipeline runs
    // it: the 80% corpus is signatured ONCE into a stored index (built
    // here on the ~86% of corpus docs with doc_id % 7 != 0, then the
    // remaining slice APPENDED incrementally — delta-only writes, base
    // files untouched, pinned in Extension80Spec), and the incoming 20%
    // batch joins the stored bands + verifies against the stored hash
    // arrays without ever touching corpus text. The oracle is the
    // recompute-from-scratch truth (shared with q66): index serve and
    // direct recompute must be row-identical.
    Q(
      "q459_persisted_band_index",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_bandidx$tag"
        val d = Sampling.hashSplit(Tables.load(s, dir, "documents"),
          "doc_id", "inc", Seq(("corpus", 0.8), ("incoming", 0.2)))
        val incoming = d.filter(col("split") === "incoming")
          .select("doc_id", "text")
        val corpus = d.filter(col("split") === "corpus")
          .select("doc_id", "text")
        Dedup.writeBandIndex(corpus.where(col("doc_id") % 7 =!= 0),
          "text", "doc_id", path)
        Dedup.appendToBandIndex(corpus.where(col("doc_id") % 7 === 0),
          "text", "doc_id", path)
        Dedup.nearDupJoinIndexed(incoming, s, path, "text", "doc_id", 0.5)
          .orderBy("da", "db")
      },
      Some(ExtensionQueries.NearDupJoinOracle)),

    // ------------------------------------------------------------------
    // q460: bucket-PRUNED point serve — the read-side payoff of
    // bucketed storage beyond the shuffle-free join: an equality
    // predicate on the bucket key prunes the scan to ONE bucket's
    // files (SelectedBucketsCount: 1 out of 8, pinned in PlanSpec), so
    // a key lookup against a 100 TB profile store reads 1/8th (or
    // 1/N-buckets) of the data with no index structure at all. The
    // probe key is deterministic (the smallest user_id in events) so
    // the oracle replays it as a scalar subquery.
    Q(
      "q460_bucket_pruned_serve",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val base =
          s"${System.getProperty("java.io.tmpdir")}/graft_buckets$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val stats = ev.groupBy("user_id").agg(
          count(lit(1)).cast("long").as("n_events"),
          sum("cents").as("total_cents"))
        Sources.writeBucketed(stats, s"graft_ups$tag",
          s"$base/ups", 8, "user_id")
        // a bare point lookup has no join/agg requiring the bucket
        // distribution, so DisableUnnecessaryBucketedScan would switch
        // the scan to non-bucketed — and with it silently drop bucket
        // PRUNING, the very thing a point serve wants. Pin the scan
        // bucketed for this session's table reads.
        s.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val probeId = ev.agg(min("user_id")).head().getLong(0)
        s.table(s"graft_ups$tag")
          .where(col("user_id") === probeId)
          .select(col("user_id"), col("n_events"), col("total_cents"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |stats AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(cents) AS BIGINT) AS total_cents
             |  FROM ev GROUP BY 1)
             |SELECT user_id, n_events, total_cents
             |FROM stats
             |WHERE user_id = (SELECT min(user_id) FROM events)
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q461: band-index DELETE + COMPACT — the rest of the index
    // lifecycle (the ANN q329 discipline applied to dedup): a corpus
    // slice is tombstoned in O(delta) (one appended row per id, no
    // rewrite), the compactor folds tombstones in through a
    // write-then-swap rewrite, and the serve result must equal a
    // from-scratch recompute against "corpus minus the deleted slice"
    // (the oracle's rsig predicate). Extension80Spec additionally pins
    // serve-before-compact == serve-after-compact.
    Q(
      "q461_band_index_delete_compact",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_bandidxdc$tag"
        val d = Sampling.hashSplit(Tables.load(s, dir, "documents"),
          "doc_id", "inc", Seq(("corpus", 0.8), ("incoming", 0.2)))
        // r15 note (verdict item 4, measured): staging this split with
        // localCheckpoint read 2.54s -> 2.37s isolated at 32c — inside
        // the box's noise band — while pinning the full corpus TEXT
        // (the wide-frame class the checkpoint rule forbids at scale).
        // The gate's seconds are the two index-write jobs + compaction
        // (real signature work), not the split re-derivation. Left.
        val incoming = d.filter(col("split") === "incoming")
          .select("doc_id", "text")
        val corpus = d.filter(col("split") === "corpus")
          .select("doc_id", "text")
        Dedup.writeBandIndex(corpus, "text", "doc_id", path)
        Dedup.deleteFromBandIndex(
          corpus.where(col("doc_id") % 11 === 0).select("doc_id"),
          "doc_id", path)
        Dedup.compactBandIndex(s, path)
        Dedup.nearDupJoinIndexed(incoming, s, path, "text", "doc_id", 0.5)
          .orderBy("da", "db")
      },
      Some(ExtensionQueries.nearDupJoinOracleWithCorpusPred(
        "(doc_id % 11) <> 0"))),

    // ------------------------------------------------------------------
    // q462: storage-satisfied AGGREGATION — the third bucketed-storage
    // plan shape: a groupBy on the bucket key over a pre-bucketed event
    // store needs NO exchange (the scan's hashpartitioning(user_id, 8)
    // already satisfies the aggregate's required distribution), so the
    // recurring "per-user rollup over the event log" job runs
    // shuffle-free below the final small histogram step. Magnitude =
    // decimal digit count of total cents (string length — exact
    // integer logic on both engines, no libm log10 boundary risk).
    // PlanSpec pins: zero hashpartitioning(user_id) exchanges.
    Q(
      "q462_bucketed_user_rollup",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val base =
          s"${System.getProperty("java.io.tmpdir")}/graft_buckets$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        Sources.writeBucketed(ev, s"graft_evb$tag",
          s"$base/evb", 8, "user_id")
        val per = s.table(s"graft_evb$tag")
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").as("total_cents"))
        per
          .groupBy(length(col("total_cents").cast("string"))
            .cast("long").as("magnitude"))
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("n").as("n_events"),
            sum("total_cents").as("sum_cents"))
          .orderBy("magnitude")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |per AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS total_cents
             |  FROM ev GROUP BY 1)
             |SELECT CAST(length(CAST(total_cents AS VARCHAR)) AS BIGINT)
             |    AS magnitude,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(n) AS BIGINT) AS n_events,
             |  CAST(sum(total_cents) AS BIGINT) AS sum_cents
             |FROM per
             |GROUP BY 1
             |ORDER BY magnitude""".stripMargin))
  )
}
