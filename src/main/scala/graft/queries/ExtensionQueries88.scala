package graft.queries

import org.apache.spark.sql.functions._

import graft.io.{TableFs, Tables}
import graft.ops.VersionedTable

/** Round-11 fourth wave — the versioned table gains the remaining
  * time-travel/lineage verbs a production lakehouse needs: q487
  * timestamp time travel (`#ts` commit clock in the manifest, strictly
  * monotonic, resolved by `readAsOfTimestamp` and the DSv2
  * `timestampAsOf` option), q488 RESTORE (re-commit a historical
  * manifest as the new current version — the metadata-only undo verb),
  * q489 shallow CLONE (fork a table by absolute manifest references —
  * zero data copied, fully divergent thereafter, copy-on-write verbs on
  * the clone never touch the source).
  */
object ExtensionQueries88 {

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q487: TIMESTAMP TIME TRAVEL. Every commit stamps a strictly
    // monotonic wall-clock into its manifest; `readAsOfTimestamp`
    // resolves "the table as of T" to the greatest commit at or before
    // T. Three commits, then three probes: AT ts(v0) → v0 only;
    // ts(v2)-1 → v1 (strict monotonicity makes ts(v2)-1 >= ts(v1),
    // so the probe lands BETWEEN commits and must serve the EARLIER
    // one); the third probe drives the DataSource V2 `timestampAsOf`
    // option at ts(v2) → the full table, proving the option resolves
    // through the same manifest clock. A probe BEFORE the first commit
    // must refuse (refused=1 rides in the gated rows — never silently
    // serve a later state). Slices replay in the oracle.
    Q(
      "q487_timestamp_time_travel",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_tsasof$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 3 === 0), path)
        VersionedTable.append(ev.where(col("event_id") % 3 === 1), path)
        VersionedTable.append(ev.where(col("event_id") % 3 === 2), path)
        val h = VersionedTable.history(path)
        val ts = h.map(c => c.version -> c.tsMillis.get).toMap
        val refused =
          try {
            VersionedTable.versionAsOfTimestamp(path, ts(0) - 1L); 0L
          } catch { case _: IllegalArgumentException => 1L }
        def agg(df: org.apache.spark.sql.DataFrame, leg: Long) =
          df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum("cents").as("sum_cents"))
            .select(lit(leg).as("leg"), col("n_rows"), col("sum_cents"),
              lit(h.length.toLong).as("n_commits"),
              lit(refused).as("refused_before_first"))
        agg(VersionedTable.readAsOfTimestamp(s, path, ts(0)), 0L)
          .unionByName(
            agg(VersionedTable.readAsOfTimestamp(s, path, ts(2) - 1L), 1L))
          .unionByName(
            agg(s.read.format("graft-versioned")
              .option("timestampAsOf", ts(2).toString).load(path), 2L))
          .orderBy("leg")
      },
      Some("""WITH ev AS (
             |  SELECT event_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(0 AS BIGINT) AS leg,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(3 AS BIGINT) AS n_commits,
             |  CAST(1 AS BIGINT) AS refused_before_first
             |FROM ev WHERE event_id % 3 = 0
             |UNION ALL
             |SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
             |  CAST(3 AS BIGINT), CAST(1 AS BIGINT)
             |FROM ev WHERE event_id % 3 IN (0, 1)
             |UNION ALL
             |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
             |  CAST(3 AS BIGINT), CAST(1 AS BIGINT)
             |FROM ev
             |ORDER BY leg""".stripMargin)),

    // ------------------------------------------------------------------
    // q488: RESTORE — the metadata-only undo. v0+v1 build the good
    // state, v2 is a BAD copy-on-write delete (drops every error row),
    // restore(1) re-commits v1's manifest as v3. The pins: the restored
    // snapshot serves EXACTLY the pre-delete state (leg 0, oracle = all
    // events); the bad state STAYS in history for audit (leg 1 reads
    // v2: errors gone); and the restore wrote ZERO data files —
    // v3's file set is identical to v1's (restored_no_new_files=1) —
    // undoing a bad delete on a 100 TB table costs one manifest write.
    Q(
      "q488_versioned_restore",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_restore$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 2 === 0), path)
        VersionedTable.append(ev.where(col("event_id") % 2 === 1), path)
        VersionedTable.deleteWhere(s, path, col("event_type") === "error")
        VersionedTable.restore(path, 1)
        val latest = VersionedTable.latestVersion(path)
        val sameFiles =
          if (VersionedTable.manifestFiles(path, latest).sorted ==
            VersionedTable.manifestFiles(path, 1).sorted) 1L
          else 0L
        def agg(df: org.apache.spark.sql.DataFrame, leg: Long) =
          df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum("cents").as("sum_cents"))
            .select(lit(leg).as("leg"), col("n_rows"), col("sum_cents"),
              lit(latest.toLong).as("latest_version"),
              lit(sameFiles).as("restored_no_new_files"))
        agg(VersionedTable.read(s, path), 0L)
          .unionByName(agg(VersionedTable.readVersion(s, path, 2), 1L))
          .orderBy("leg")
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT CAST(0 AS BIGINT) AS leg,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(3 AS BIGINT) AS latest_version,
             |  CAST(1 AS BIGINT) AS restored_no_new_files
             |FROM ev
             |UNION ALL
             |SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
             |  CAST(3 AS BIGINT), CAST(1 AS BIGINT)
             |FROM ev WHERE event_type <> 'error'
             |ORDER BY leg""".stripMargin)),

    // ------------------------------------------------------------------
    // q489: SHALLOW CLONE — fork a table with ZERO data copied: the
    // clone's v0 manifest references the source's files by absolute
    // path (zero_copy=1 pins that the clone directory holds NO local
    // commit dir at clone time). The tables then diverge: the clone
    // absorbs an append (bonus slice, cents+1000) and a copy-on-write
    // delete of every click — the delete REWRITES the affected
    // source-referenced files INTO THE CLONE's own directory, and the
    // source must remain bit-identical (leg 0 re-aggregates it after
    // all clone mutations; the oracle replays the untouched source).
    Q(
      "q489_versioned_shallow_clone",
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val tmp = System.getProperty("java.io.tmpdir")
        val src = s"$tmp/graft_clone_src$tag"
        val dst = s"$tmp/graft_clone_dst$tag"
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        VersionedTable.init(ev.where(col("event_id") % 2 === 0), src)
        VersionedTable.append(ev.where(col("event_id") % 2 === 1), src)
        TableFs.deleteRecursive(dst)
        VersionedTable.cloneTable(src, dst)
        val zeroCopy =
          if (TableFs.listNames(dst).exists(_.matches("c\\d{5}"))) 0L
          else 1L
        VersionedTable.append(
          ev.where(col("event_id") % 2 === 0)
            .withColumn("cents", col("cents") + 1000L), dst)
        VersionedTable.deleteWhere(s, dst, col("event_type") === "click")
        def agg(df: org.apache.spark.sql.DataFrame, leg: Long) =
          df.agg(count(lit(1)).cast("long").as("n_rows"),
            sum("cents").as("sum_cents"))
            .select(lit(leg).as("leg"), col("n_rows"), col("sum_cents"),
              lit(zeroCopy).as("zero_copy"))
        agg(VersionedTable.read(s, src), 0L)
          .unionByName(agg(VersionedTable.read(s, dst), 1L))
          .orderBy("leg")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |cl AS (
             |  SELECT event_type, cents FROM ev
             |  UNION ALL
             |  SELECT event_type, cents + 1000 FROM ev
             |  WHERE event_id % 2 = 0)
             |SELECT CAST(0 AS BIGINT) AS leg,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(1 AS BIGINT) AS zero_copy
             |FROM ev
             |UNION ALL
             |SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT),
             |  CAST(1 AS BIGINT)
             |FROM cl WHERE event_type <> 'click'
             |ORDER BY leg""".stripMargin)))
}
