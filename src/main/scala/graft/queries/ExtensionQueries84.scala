package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.VersionedTable

/** Round-10 fifth wave — completes the versioned-table lifecycle with
  * the two remaining table-format verbs: q472 MERGE (Delta-style
  * upsert, copy-on-write at file granularity keyed by a broadcast
  * key-probe) and q473 OPTIMIZE (small-files compaction as a new
  * version — historical snapshots survive untouched). With
  * init/append/deleteWhere/merge/compact/diff/time-travel the storage
  * layer now covers the full maintenance loop a 100 TB curated corpus
  * runs: ingest, correct, retract, defragment, audit — all under
  * snapshot isolation.
  */
object ExtensionQueries84 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q472: MERGE INTO the versioned store — v0 is one event slice;
    // the merge batch carries BOTH row corrections (every purchase row
    // of the base slice, cents bumped by 1 — same key, new payload)
    // AND brand-new keys (a second slice). Post-merge the snapshot must
    // read: non-purchase base rows untouched, purchases replaced, new
    // slice present — which is exactly what the oracle reconstructs
    // from raw events. Copy-on-write: only files CONTAINING a matched
    // key are rewritten (Extension84Spec pins carried-by-reference
    // files and pre-merge snapshot intactness).
    Q(
      "q472_versioned_merge_upsert",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_vmerge$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val base = ev.where(col("event_id") % 3 === 0)
        VersionedTable.init(base, path)
        val corrections = base.where(col("event_type") === "purchase")
          .withColumn("cents", col("cents") + 1L)
        val newRows = ev.where(col("event_id") % 3 === 1)
        VersionedTable.merge(s, path,
          corrections.unionByName(newRows), Seq("event_id"))
        VersionedTable.read(s, path)
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |merged AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 3 = 0 AND event_type = 'purchase'
             |         THEN cents + 1 ELSE cents END AS cents
             |  FROM ev WHERE event_id % 3 IN (0, 1))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM merged
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q473: OPTIMIZE under version history — three fragmenting commits
    // (4 + 3 + 3 files, controlled by explicit repartition) then a
    // compaction to 2 files as version 3. The output reads BOTH the
    // fragmented and the compacted snapshot: identical rows and sums,
    // different file counts — and the file counts are part of the
    // gated row (the oracle pins 10 vs 2), so a compaction that
    // silently changed data OR didn't actually defragment fails the
    // hash. Historical snapshots stay readable (Extension84Spec).
    Q(
      "q473_versioned_compaction",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_vcompact$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 3 === 0)
          .repartition(4), path)
        VersionedTable.append(ev.where(col("event_id") % 3 === 1)
          .repartition(3), path)
        VersionedTable.append(ev.where(col("event_id") % 3 === 2)
          .repartition(3), path)
        VersionedTable.compact(s, path, 2)
        def snap(v: Int) = {
          val nf = VersionedTable.manifestFiles(path, v).length.toLong
          VersionedTable.readVersion(s, path, v)
            .agg(count(lit(1)).cast("long").as("n_rows"),
              sum("cents").as("sum_cents"))
            .select(lit(v.toLong).as("version"), lit(nf).as("n_files"),
              col("n_rows"), col("sum_cents"))
        }
        snap(2).unionByName(snap(3)).orderBy("version")
      },
      Some("""WITH ev AS (
             |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(2 AS BIGINT) AS version,
             |  CAST(10 AS BIGINT) AS n_files,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM ev
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), CAST(2 AS BIGINT),
             |  CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
             |FROM ev
             |ORDER BY version""".stripMargin)),

    // ------------------------------------------------------------------
    // q474: SCHEMA EVOLUTION under version history — v0 is written
    // (event_id, cents); the v1 append INTRODUCES a `source` column.
    // The current read surfaces the union schema with legacy rows
    // null-filled (bucketed below under 'legacy'), while v0 — whose
    // manifest references only pre-evolution files — still reads with
    // its original 2-column schema (carried into the gated row as
    // v0_cols). Old files are never rewritten for the evolution: it is
    // a manifest + read-schema concern only, which is what keeps an
    // evolving 100 TB corpus writable without a table-wide migration.
    Q(
      "q474_versioned_schema_evolution",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_vevolve$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 3 === 0)
          .select("event_id", "cents"), path)
        VersionedTable.append(ev.where(col("event_id") % 3 === 1)
          .select(col("event_id"), col("cents"),
            col("event_type").as("source")), path)
        val v0Cols =
          VersionedTable.readVersion(s, path, 0).columns.length.toLong
        VersionedTable.read(s, path)
          .groupBy(coalesce(col("source"), lit("legacy")).as("source"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").as("sum_cents"))
          .withColumn("v0_cols", lit(v0Cols))
          .orderBy("source")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |rows AS (
             |  SELECT 'legacy' AS source, cents FROM ev
             |  WHERE event_id % 3 = 0
             |  UNION ALL
             |  SELECT event_type, cents FROM ev WHERE event_id % 3 = 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(2 AS BIGINT) AS v0_cols
             |FROM rows
             |GROUP BY source
             |ORDER BY source""".stripMargin))
  )
}
