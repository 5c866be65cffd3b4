package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.VersionedTable

/** Round-11 sixth wave — q494: storage-partitioned joins. Two
  * versioned tables compacted on the same key join with ZERO shuffle:
  * the DSv2 scans report `KeyGroupedPartitioning(identity(pk))` with
  * per-file partition keys, and Catalyst's key-grouped planner
  * (`spark.sql.sources.v2.bucketing.enabled`) satisfies the join
  * distribution straight from storage — the Iceberg SPJ shape. At
  * 100 TB the two Exchanges this deletes are usually the entire cost
  * of a fact-to-fact join.
  */
object ExtensionQueries90 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q494: the fact table (events keyed by pk = event_id % 16) and a
    // per-pk dim (row counts per key) are both compactPartitioned on
    // pk; leg 0 joins them under the key-grouped planner — the
    // executed plan carries ZERO ShuffleExchange (spj=1,
    // zero_exchange=1, read off the physical plan with AQE pinned off
    // for determinism); leg 1 re-plans the SAME join with the planner
    // disabled — both sides shuffle (zero_exchange=0) and the
    // aggregates are identical. The oracle replays the join from raw
    // events.
    Q(
      "q494_storage_partitioned_join",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val tmp = System.getProperty("java.io.tmpdir")
        val pFact = s"$tmp/graft_spj_fact$tag"
        val pDim = s"$tmp/graft_spj_dim$tag"
        val ev = Tables.load(s, dir, "events")
          .select((col("event_id") % 16).as("pk"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), pFact)
        VersionedTable.compactPartitioned(s, pFact, "pk")
        VersionedTable.init(
          ev.groupBy("pk").agg(count(lit(1)).cast("long").as("factor")),
          pDim)
        VersionedTable.compactPartitioned(s, pDim, "pk")
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled",
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.enabled")
        val olds = confs.map(k => k -> s.conf.getOption(k))
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          def leg(spj: Boolean, label: Long) = {
            s.conf.set("spark.sql.sources.v2.bucketing.enabled",
              spj.toString)
            val j = s.read.format("graft-versioned").load(pFact)
              .join(s.read.format("graft-versioned").load(pDim), "pk")
            val nEx = j.queryExecution.executedPlan.collect {
              case _: org.apache.spark.sql.execution.exchange
                .ShuffleExchangeExec => 1
            }.sum
            j.agg(count(lit(1)).cast("long").as("n_rows"),
              sum("cents").as("sum_cents"),
              sum(col("cents") + col("factor")).as("sum_weighted"))
              .select(lit(label).as("leg"),
                lit(if (spj) 1L else 0L).as("spj"),
                lit(if (nEx == 0) 1L else 0L).as("zero_exchange"),
                col("n_rows"), col("sum_cents"), col("sum_weighted"))
          }
          leg(spj = true, 0L).unionByName(leg(spj = false, 1L))
            .orderBy("leg")
        } finally olds.foreach { case (k, v) =>
          v.fold(s.conf.unset(k))(s.conf.set(k, _))
        }
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 16 AS pk,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |dim AS (
             |  SELECT pk, CAST(count(*) AS BIGINT) AS factor
             |  FROM ev GROUP BY pk),
             |j AS (
             |  SELECT ev.cents, dim.factor
             |  FROM ev JOIN dim ON ev.pk = dim.pk)
             |SELECT CAST(0 AS BIGINT) AS leg, CAST(1 AS BIGINT) AS spj,
             |  CAST(1 AS BIGINT) AS zero_exchange,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(cents + factor) AS BIGINT) AS sum_weighted
             |FROM j
             |UNION ALL
             |SELECT 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |  CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
             |  CAST(sum(cents + factor) AS BIGINT)
             |FROM j
             |ORDER BY leg""".stripMargin)),

    // ------------------------------------------------------------------
    // q495: RUNTIME (DYNAMIC) PARTITION PRUNING. The key-grouped scan
    // implements SupportsRuntimeV2Filtering on its partition column:
    // when a broadcast join's build side carries a selective filter,
    // Spark's dynamic-pruning rule materializes the dim's key set at
    // RUNTIME and hands it to the scan as an IN predicate — splits of
    // non-matching keys never open. Here the dim filter keeps 4 of 16
    // keys, so the fact scan drops 12/16 of its splits AFTER planning,
    // with no static predicate on the fact at all (the classic
    // star-schema win; at 100 TB this reads 4 partitions instead of
    // the table). runtime_pruned pins splits-after < splits-before,
    // read off the scan instance the collected plan actually ran.
    Q(
      "q495_runtime_partition_pruning",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val tmp = System.getProperty("java.io.tmpdir")
        val pFact = s"$tmp/graft_dpp_fact$tag"
        val pDim = s"$tmp/graft_dpp_dim$tag"
        val ev = Tables.load(s, dir, "events")
          .select((col("event_id") % 16).as("pk"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), pFact)
        VersionedTable.compactPartitioned(s, pFact, "pk")
        VersionedTable.init(
          ev.select("pk").distinct()
            .withColumn("tag", col("pk") % 5), pDim)
        val oldAqe = s.conf.get("spark.sql.adaptive.enabled")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val fact = s.read.format("graft-versioned").load(pFact)
          val dim = s.read.format("graft-versioned").load(pDim)
            .where(col("tag") === 0) // keys 0, 5, 10, 15
          val agg = fact.join(broadcast(dim), "pk")
            .agg(count(lit(1)).cast("long").as("n_rows"),
              sum("cents").as("sum_cents"))
          val row = agg.collect().head
          val scan = agg.queryExecution.executedPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec
              if b.scan.isInstanceOf[graft.sources.GraftPartitionedScan]
              => b.scan.asInstanceOf[graft.sources.GraftPartitionedScan]
          }.getOrElse(sys.error("no key-grouped fact scan planned"))
          val (before, after) = scan.splitCounts
          s.range(1).select(
            lit(if (after < before && after > 0) 1L else 0L)
              .as("runtime_pruned"),
            lit(row.getLong(0)).as("n_rows"),
            lit(row.getLong(1)).as("sum_cents"))
        } finally s.conf.set("spark.sql.adaptive.enabled", oldAqe)
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 16 AS pk,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(1 AS BIGINT) AS runtime_pruned,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM ev WHERE pk % 5 = 0""".stripMargin)),

    // ------------------------------------------------------------------
    // q496: LIMIT PUSHDOWN — the scan builder accepts the pushed limit
    // and CAPS THE FILE LIST via the manifest's footer row counts:
    // only the first files whose cumulative counts reach the limit are
    // planned (here 1 of 10; at 100 TB a LIMIT 10 preview opens one
    // file instead of ten thousand). Partial-pushdown semantics keep
    // Spark's own Limit on top, so the cap is purely an I/O saving —
    // and it only applies to filter-free scans (a residual filter
    // would make raw counts the wrong budget; pinned in the spec).
    Q(
      "q496_limit_pushdown_file_cap",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_limit$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(10), path)
        val view = s"graft_limit_view$tag"
        s.read.format("graft-versioned").load(path)
          .createOrReplaceTempView(view)
        val q = s.sql(s"SELECT * FROM $view LIMIT 7")
        val (opened, total) = q.queryExecution.sparkPlan.collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec =>
            (b.scan.asInstanceOf[graft.sources.GraftVersionedFileScan]
              .fileIndex.inputFiles.length.toLong,
              VersionedTable.manifestFiles(path, 0).length.toLong)
        }.getOrElse(sys.error("no V2 scan planned under LIMIT"))
        s.range(1).select(
          lit(q.collect().length.toLong).as("n_rows"),
          lit(opened).as("files_opened"), lit(total).as("files_total"))
      },
      Some("""SELECT CAST(7 AS BIGINT) AS n_rows,
             |  CAST(1 AS BIGINT) AS files_opened,
             |  CAST(10 AS BIGINT) AS files_total""".stripMargin)),

    // ------------------------------------------------------------------
    // q497: SHUFFLE-FREE KEYED AGGREGATION. The key-grouped layout
    // serves GROUP BY exactly like it serves joins: the scan's
    // KeyGroupedPartitioning satisfies the aggregation's clustered
    // distribution, so partial AND final HashAggregate fuse into ONE
    // whole-stage span with ZERO Exchange (leg 0) — the same
    // aggregation with the key-grouped planner off shuffles between
    // the two phases (leg 1). Identical per-key results either way,
    // replayed by the oracle. At 100 TB a keyed rollup over a
    // key-grouped corpus never moves a row.
    Q(
      "q497_shuffle_free_keyed_agg",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_kagg$tag"
        val ev = Tables.load(s, dir, "events")
          .select((col("event_id") % 16).as("pk"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), path)
        VersionedTable.compactPartitioned(s, path, "pk")
        val confs = Seq("spark.sql.sources.v2.bucketing.enabled",
          "spark.sql.adaptive.enabled")
        val olds = confs.map(k => k -> s.conf.getOption(k))
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          def leg(grouped: Boolean, label: Long) = {
            s.conf.set("spark.sql.sources.v2.bucketing.enabled",
              grouped.toString)
            val agg = s.read.format("graft-versioned").load(path)
              .groupBy("pk")
              .agg(count(lit(1)).cast("long").as("n"),
                sum("cents").as("sum_cents"))
            val nEx = agg.queryExecution.executedPlan.collect {
              case _: org.apache.spark.sql.execution.exchange
                .ShuffleExchangeExec => 1
            }.sum
            agg.select(lit(label).as("leg"),
              lit(if (nEx == 0) 1L else 0L).as("zero_exchange"),
              col("pk"), col("n"), col("sum_cents"))
          }
          leg(grouped = true, 0L).unionByName(leg(grouped = false, 1L))
            .orderBy("leg", "pk")
        } finally olds.foreach { case (k, v) =>
          v.fold(s.conf.unset(k))(s.conf.set(k, _))
        }
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 16 AS pk,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |g AS (
             |  SELECT pk, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS sum_cents
             |  FROM ev GROUP BY pk)
             |SELECT CAST(0 AS BIGINT) AS leg,
             |  CAST(1 AS BIGINT) AS zero_exchange, pk, n, sum_cents
             |FROM g
             |UNION ALL
             |SELECT 1, CAST(0 AS BIGINT), pk, n, sum_cents FROM g
             |ORDER BY leg, pk""".stripMargin)),

    // ------------------------------------------------------------------
    // q498: BATCH CHANGE FEED — tableChanges(fromV, toV) renders WHAT
    // EACH COMMIT DID as rows tagged (change, commit_version): the
    // append shows as its slice 'added'; the copy-on-write delete
    // shows as exactly the deleted rows 'removed' (the rewritten
    // survivors CANCEL in the multiset diff — they moved files, not
    // values); the MERGE shows as old-row 'removed' + new-row 'added'
    // per matched key. Cost per commit is its changed files only. The
    // oracle replays all three commits' effects from raw events.
    Q(
      "q498_table_changes_feed",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_changes$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 2 === 0), path)
        VersionedTable.append(ev.where(col("event_id") % 2 === 1), path)
        VersionedTable.deleteWhere(s, path, col("event_type") === "error")
        VersionedTable.merge(s, path,
          ev.where(col("event_type") === "purchase")
            .withColumn("cents", col("cents") + 5L),
          Seq("event_id"))
        VersionedTable.tableChanges(s, path, 0,
          VersionedTable.latestVersion(path))
          .groupBy("commit_version", "change", "event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").as("sum_cents"))
          .orderBy("commit_version", "change", "event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(1 AS BIGINT) AS commit_version,
             |  'added' AS change, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM ev WHERE event_id % 2 = 1 GROUP BY event_type
             |UNION ALL
             |SELECT 2, 'removed', event_type, CAST(count(*) AS BIGINT),
             |  CAST(sum(cents) AS BIGINT)
             |FROM ev WHERE event_type = 'error' GROUP BY event_type
             |UNION ALL
             |SELECT 3, 'added', 'purchase', CAST(count(*) AS BIGINT),
             |  CAST(sum(cents + 5) AS BIGINT)
             |FROM ev WHERE event_type = 'purchase'
             |UNION ALL
             |SELECT 3, 'removed', 'purchase', CAST(count(*) AS BIGINT),
             |  CAST(sum(cents) AS BIGINT)
             |FROM ev WHERE event_type = 'purchase'
             |ORDER BY commit_version, change, event_type"""
        .stripMargin)),

    // ------------------------------------------------------------------
    // q499: SQL `TIMESTAMP AS OF` through the catalog — Catalyst hands
    // the timestamp literal (micros) to
    // GraftCatalog.loadTable(ident, timestamp), which resolves it
    // through the same strictly-monotonic manifest clock as q487's
    // library/option paths. Three INSERT commits; the probe timestamp
    // is version 1's own commit stamp (read from history), so the
    // as-of read must serve EXACTLY the first insert; the plain read
    // serves all three.
    Q(
      "q499_sql_timestamp_as_of",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graftcat.warehouse",
          s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
        val tbl = s"graftcat.tsev_$tag"
        val src = s"graft_tsas_src_$tag"
        Tables.load(s, dir, "events")
          .select(col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
          .createOrReplaceTempView(src)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl (event_id BIGINT, cents BIGINT)")
        s.sql(s"INSERT INTO $tbl SELECT * FROM $src WHERE event_id % 3 = 0")
        s.sql(s"INSERT INTO $tbl SELECT * FROM $src WHERE event_id % 3 = 1")
        s.sql(s"INSERT INTO $tbl SELECT * FROM $src WHERE event_id % 3 = 2")
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
        // probe half a millisecond AFTER v1's stamp: the double cast
        // is microsecond-exact to ~1e-7 s, and v2 is >= 1 ms later, so
        // the probe lands strictly inside (ts1, ts2)
        val ts1 = VersionedTable.history(s"$wh/tsev_$tag")
          .find(_.version == 1).get.tsMillis.get
        s.sql(
          s"""SELECT 1 AS as_of, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM $tbl TIMESTAMP AS OF CAST(${(ts1 + 0.5) / 1000.0} AS TIMESTAMP)
             |UNION ALL
             |SELECT 2, CAST(count(*) AS BIGINT),
             |  CAST(sum(cents) AS BIGINT)
             |FROM $tbl
             |ORDER BY as_of""".stripMargin)
      },
      Some("""WITH ev AS (
             |  SELECT event_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT 1 AS as_of, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM ev WHERE event_id % 3 = 0
             |UNION ALL
             |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
             |FROM ev
             |ORDER BY as_of""".stripMargin)))
}
