package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.VersionedTable

/** Round-11 seventh wave — the last two planner shortcuts the manifest
  * can fund: q500 TOP-N pushdown (ORDER BY the clustered column opens
  * only the band that can hold the top k) and q501 metadata-only
  * GROUP BY the partition key (per-key COUNT(*) from pv + footer
  * counts, zero data files).
  */
object ExtensionQueries91 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q500: TOP-N PUSHDOWN. ORDER BY the clustered column + LIMIT k
    // keeps file F only when fewer than k rows PROVABLY sort before it
    // — on a range-clustered table that is one band per direction.
    // NULLS are the trap (zone stats describe only non-null values),
    // so the budget counts NON-NULL footer rows (rc − nc) and the
    // null prefix comes from the manifest's per-file null counts:
    // since r12, Spark's DEFAULT ASC (NULLS FIRST) engages too — leg 2
    // orders a genuinely nullable column NULLS FIRST and still caps,
    // returning the null rows first (r11 this refused and scanned
    // everything). Partial-pushdown semantics keep Spark's
    // TakeOrderedAndProject on top. At 100 TB "show me the earliest
    // rows" stops being a table scan.
    Q(
      "q500_topn_pushdown",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_topn$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"),
            (col("event_id") % 1000).as("bucket"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), path)
        VersionedTable.compactClustered(s, path, 8, "bucket")
        val view = s"graft_topn_view$tag"
        s.read.format("graft-versioned").load(path)
          .createOrReplaceTempView(view)
        // second table: nullable sort column (cents NULL for clicks)
        // exercising the NULLS FIRST prefix algebra
        val pathN =
          s"${System.getProperty("java.io.tmpdir")}/graft_topn_n$tag"
        VersionedTable.init(
          Tables.load(s, dir, "events")
            .select(col("event_id"),
              (col("event_id") % 1000).as("bucket"),
              when(col("event_type") === "click", lit(null))
                .otherwise(floor(col("value") * 100 + 0.5))
                .cast("long").as("cents"))
            .repartition(4), pathN)
        VersionedTable.compactClustered(s, pathN, 8, "cents")
        val viewN = s"graft_topn_nview$tag"
        s.read.format("graft-versioned").load(pathN)
          .createOrReplaceTempView(viewN)
        def leg(label: Long, sql: String, total: Int) = {
          val q = s.sql(sql)
          val opened = q.queryExecution.sparkPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec =>
              b.scan.asInstanceOf[graft.sources.GraftVersionedFileScan]
                .fileIndex.inputFiles.length.toLong
          }.getOrElse(sys.error("no V2 scan planned under TOP-N"))
          q.select(lit(label).as("leg"),
            lit(if (opened < total) 1L else 0L).as("capped"),
            col("event_id"), col("bucket"), col("cents"))
        }
        leg(0L, s"SELECT event_id, bucket, cents FROM $view " +
          "ORDER BY bucket ASC NULLS LAST, event_id LIMIT 3", 8)
          .unionByName(leg(1L,
            s"SELECT event_id, bucket, cents FROM $view " +
              "ORDER BY bucket DESC, event_id LIMIT 3", 8))
          .unionByName(leg(2L,
            s"SELECT event_id, bucket, cents FROM $viewN " +
              "ORDER BY cents ASC NULLS FIRST, event_id LIMIT 3", 8))
          .orderBy("leg", "bucket", "event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_id % 1000 AS bucket,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |evn AS (
             |  SELECT event_id, event_id % 1000 AS bucket,
             |    CASE WHEN event_type = 'click' THEN NULL
             |         ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
             |    END AS cents
             |  FROM events),
             |lo AS (SELECT * FROM ev ORDER BY bucket ASC, event_id
             |       LIMIT 3),
             |hi AS (SELECT * FROM ev ORDER BY bucket DESC, event_id
             |       LIMIT 3),
             |nf AS (SELECT * FROM evn
             |       ORDER BY cents ASC NULLS FIRST, event_id LIMIT 3)
             |SELECT CAST(0 AS BIGINT) AS leg, CAST(1 AS BIGINT) AS capped,
             |  event_id, CAST(bucket AS BIGINT) AS bucket, cents
             |FROM lo
             |UNION ALL
             |SELECT 1, CAST(1 AS BIGINT), event_id,
             |  CAST(bucket AS BIGINT), cents
             |FROM hi
             |UNION ALL
             |SELECT 2, CAST(1 AS BIGINT), event_id,
             |  CAST(bucket AS BIGINT), cents
             |FROM nf
             |ORDER BY leg, bucket, event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q501: METADATA-ONLY GROUP BY. Over a key-grouped snapshot the
    // manifest records both the per-file partition KEY and the
    // per-file footer COUNT, so `SELECT pk, count(*) GROUP BY pk` is
    // pure manifest algebra: the planned scan is GraftMetadataAggScan
    // (metadata_only=1), ZERO data files — the per-partition row-count
    // report every 100 TB corpus dashboard wants, for free. Leg 1 is
    // the contrast: sum(cents) needs real data and falls back to the
    // key-grouped file scan (which still aggregates shuffle-free).
    Q(
      "q501_metadata_grouped_count",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_gcount$tag"
        val ev = Tables.load(s, dir, "events")
          .select((col("event_id") % 16).as("pk"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), path)
        VersionedTable.compactPartitioned(s, path, "pk")
        val view = s"graft_gcount_view$tag"
        s.read.format("graft-versioned").load(path)
          .createOrReplaceTempView(view)
        def leg(label: Long, sql: String) = {
          val q = s.sql(sql)
          val scanClass = q.queryExecution.sparkPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b.scan.getClass.getSimpleName
          }.getOrElse(sys.error("no V2 scan planned"))
          q.select(lit(label).as("leg"), col("pk"), col("v"),
            lit(if (scanClass == "GraftMetadataAggScan") 1L else 0L)
              .as("metadata_only"))
        }
        leg(0L, s"SELECT pk, count(*) AS v FROM $view GROUP BY pk")
          .unionByName(leg(1L,
            s"SELECT pk, sum(cents) AS v FROM $view GROUP BY pk"))
          .orderBy("leg", "pk")
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 16 AS pk,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(0 AS BIGINT) AS leg, pk,
             |  CAST(count(*) AS BIGINT) AS v,
             |  CAST(1 AS BIGINT) AS metadata_only
             |FROM ev GROUP BY pk
             |UNION ALL
             |SELECT 1, pk, CAST(sum(cents) AS BIGINT),
             |  CAST(0 AS BIGINT)
             |FROM ev GROUP BY pk
             |ORDER BY leg, pk""".stripMargin)),

    // ------------------------------------------------------------------
    // q502: METADATA-ONLY COUNT(col). Parquet footers already carry
    // per-column NULL counts in their column-chunk statistics; every
    // commit now records them as manifest `nc` lines (same one-footer-
    // open-per-new-file cost as the row counts), so `COUNT(col)` =
    // rows − nulls(col) is pure manifest algebra — bare (leg 0) AND
    // per-partition-key (leg 1: count(*) + count(cents) GROUP BY pk,
    // mixed in one metadata scan). COUNT(DISTINCT col) needs real
    // values and falls back (leg 2, metadata_only=0). The nullable
    // column is real: cents is NULL for every click event.
    Q(
      "q502_metadata_count_column",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_ccount$tag"
        val ev = Tables.load(s, dir, "events")
          .select((col("event_id") % 16).as("pk"),
            when(col("event_type") === "click", lit(null))
              .otherwise(floor(col("value") * 100 + 0.5))
              .cast("long").as("cents"))
        VersionedTable.init(ev.repartition(4), path)
        VersionedTable.compactPartitioned(s, path, "pk")
        val view = s"graft_ccount_view$tag"
        s.read.format("graft-versioned").load(path)
          .createOrReplaceTempView(view)
        def leg(label: Long, sql: String) = {
          val q = s.sql(sql)
          val scanClass = q.queryExecution.sparkPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b.scan.getClass.getSimpleName
          }.getOrElse(sys.error("no V2 scan planned"))
          q.select(lit(label).as("leg"), col("pk"), col("v1"), col("v2"),
            lit(if (scanClass == "GraftMetadataAggScan") 1L else 0L)
              .as("metadata_only"))
        }
        leg(0L, s"SELECT CAST(-1 AS BIGINT) AS pk, count(*) AS v1, " +
          s"count(cents) AS v2 FROM $view")
          .unionByName(leg(1L,
            s"SELECT pk, count(*) AS v1, count(cents) AS v2 " +
              s"FROM $view GROUP BY pk"))
          .unionByName(leg(2L,
            s"SELECT CAST(-1 AS BIGINT) AS pk, " +
              s"count(DISTINCT cents) AS v1, " +
              s"CAST(0 AS BIGINT) AS v2 FROM $view"))
          .orderBy("leg", "pk")
      },
      Some("""WITH ev AS (
             |  SELECT event_id % 16 AS pk,
             |    CASE WHEN event_type = 'click' THEN NULL
             |         ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
             |    END AS cents
             |  FROM events)
             |SELECT CAST(0 AS BIGINT) AS leg, CAST(-1 AS BIGINT) AS pk,
             |  CAST(count(*) AS BIGINT) AS v1,
             |  CAST(count(cents) AS BIGINT) AS v2,
             |  CAST(1 AS BIGINT) AS metadata_only
             |FROM ev
             |UNION ALL
             |SELECT 1, pk, CAST(count(*) AS BIGINT),
             |  CAST(count(cents) AS BIGINT), CAST(1 AS BIGINT)
             |FROM ev GROUP BY pk
             |UNION ALL
             |SELECT 2, CAST(-1 AS BIGINT),
             |  CAST(count(DISTINCT cents) AS BIGINT),
             |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
             |FROM ev
             |ORDER BY leg, pk""".stripMargin)))
}
