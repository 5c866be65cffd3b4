package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

import graft.ops.VersionedTable

/** LEGACY V1 streaming SOURCE over a [[graft.ops.VersionedTable]] —
  * superseded in r12 by the DataSource V2
  * [[GraftVersionedMicroBatchStream]] (public connector API + admission
  * control), which `readStream` now selects via the table's
  * MICRO_BATCH_READ capability; this class remains as the documented
  * V1 shape and for explicit `StreamSourceProvider` consumers. Offsets
  * and semantics are identical (the wire form of the offset json is
  * shared), so checkpoints are interchangeable.
  *
  * Original r11 role: q477/q485 stream INTO the
  * table exactly-once; this streams OUT of it, turning every committed
  * manifest version into micro-batch input
  * (`spark.readStream.format("graft-versioned").load(path)`).
  *
  * Offsets ARE version numbers: a micro-batch (start, end] reads
  * exactly the data files ADDED by manifests start+1..end — an
  * append-only change feed, the Delta/Iceberg incremental-read shape.
  * Because the offset is derived from durable table state alone
  * (latest committed version), restarts are trivially monotonic: no
  * source-side offset log to desync from the checkpoint. Each batch's
  * file list is a pure function of the manifest pair, so a replayed
  * batch is bit-identical — composing with the `appendIdempotent`
  * foreachBatch sinks for end-to-end exactly-once table-to-table
  * pipelines.
  *
  * Non-append commits (copy-on-write delete/merge/CDC, OPTIMIZE,
  * restore, deletion-vector commits) REFUSE LOUDLY by default — a
  * change feed that silently dropped deletes would be wrong. With
  * `ignoreChanges=true` the source emits only each commit's ADDED
  * files (rewritten survivors re-emit, pure deletes vanish — exactly
  * Delta's documented `ignoreChanges` semantics). Metadata-only
  * commits (bloom builds, idempotence records) yield an EMPTY batch.
  *
  * Options: `startingVersion` = first version to serve (default 0 —
  * the full history becomes the first batch; `latest` = only commits
  * after stream start). The scan is a plain distributed parquet read
  * of the batch's files (vectorized, executor-side); the driver only
  * diffs manifests.
  */
class GraftVersionedStreamSource(
    sqlContext: SQLContext,
    path: String,
    startingVersion: Int,
    ignoreChanges: Boolean,
    override val schema: StructType)
    extends Source {

  private def ver(o: OffsetV1): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => other.json.trim.toInt
  }

  /** Latest committed version — table state IS the offset, so this is
    * monotonic across restarts with zero source-side bookkeeping. When
    * `startingVersion` lies beyond the current latest (the `latest`
    * mode right after stream start, or an explicit future version),
    * the START MARKER (startingVersion - 1) is offered instead: the
    * engine logs it as an empty batch, making the skip-the-backlog
    * decision durable in the checkpoint — a restart resumes from the
    * marker even though `latest` would re-resolve higher by then.
    */
  override def getOffset: Option[OffsetV1] = {
    val l = VersionedTable.latestVersion(path)
    val marker = startingVersion - 1
    if (l < 0 && marker < 0) None
    else Some(LongOffset(math.max(l, marker).toLong))
  }

  /** Data files added by versions start+1..end (or
    * startingVersion..end for the first batch), append-only enforced
    * per commit.
    */
  private def addedFiles(fromV: Int, toV: Int): Seq[String] =
    GraftVersionedStreamSource.addedFiles(path, ignoreChanges, fromV, toV)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    // a checkpointed start offset takes precedence over
    // startingVersion — the option scopes only the FIRST batch, so a
    // restarted `latest`-mode stream never re-resolves and skips
    // commits made while it was down
    val fromV = start.map(ver(_) + 1).getOrElse(startingVersion)
    val toV = ver(end)
    val files =
      if (fromV > toV) Seq.empty[String]
      else addedFiles(fromV, toV)
    val spark = sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the FileStreamSource discipline: a batch is a LogicalRelation
    // over exactly this batch's files, flagged isStreaming — fully
    // distributed, vectorized, schema pinned to the source schema so
    // evolution-era files null-fill
    val relation = DataSource(
      sparkSession = spark,
      className = "parquet",
      paths = files.map(r => VersionedTable.absPath(path, r)),
      userSpecifiedSchema = Some(schema)).resolveRelation(
      checkFilesExist = false)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      spark, LogicalRelation(relation, isStreaming = true))
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftVersionedStreamSource[$path, startingVersion=$startingVersion]"
}

object GraftVersionedStreamSource {

  /** Data files ADDED by each of versions fromV..toV (v0 counts whole),
    * append-only enforced per commit unless `ignoreChanges` — shared
    * by the V1 Source and the DSv2 [[GraftVersionedMicroBatchStream]].
    */
  /** Per-commit change set with the vacuumed-predecessor error
    * wrapped descriptively — commitChanges on a delta manifest reads
    * ONE file (its actions are literal lines); only checkpoint commits
    * fold their predecessor.
    */
  private[sources] def changesOf(path: String,
                                 v: Int): (Seq[String], Seq[String], Boolean) =
    try VersionedTable.commitChanges(path, v)
    catch {
      case e: IllegalArgumentException => throw new IllegalStateException(
        s"graft-versioned stream at $path: a predecessor of v$v was " +
          s"vacuumed — cannot derive the change set of v$v", e)
    }

  private[sources] def addedFiles(path: String, ignoreChanges: Boolean,
                                  fromV: Int, toV: Int): Seq[String] =
    (fromV to toV).flatMap { v =>
      if (v == 0) VersionedTable.readManifest(path, 0).data
      else {
        val (added, removed, dvChanged) = changesOf(path, v)
        if ((removed.nonEmpty || dvChanged) && !ignoreChanges)
          throw new IllegalStateException(
            s"graft-versioned stream at $path: version $v is not " +
              s"append-only (${removed.size} files removed" +
              (if (dvChanged) ", deletion vectors changed" else "") +
              ") — a change feed that dropped deletes silently would " +
              "be wrong; pass ignoreChanges=true to stream only added " +
              "files (rewritten rows re-emit, deletes vanish)")
        added
      }
    }

  private[sources] def resolveStart(path: String, opt: Option[String],
                                    tsOpt: Option[String] = None): Int =
    opt match {
      case Some("latest") => VersionedTable.latestVersion(path) + 1
      case Some(v) => v.trim.toInt
      case None => tsOpt match {
        // startingTimestamp (epoch millis): the first version committed
        // AT or AFTER the probe — Delta's semantics; a future timestamp
        // serves only commits made after stream start. startingVersion
        // wins when both are set.
        case Some(ts) =>
          val probe = ts.trim.toLong
          VersionedTable.history(path)
            .find(_.tsMillis.exists(_ >= probe)).map(_.version)
            .getOrElse(VersionedTable.latestVersion(path) + 1)
        case None => 0
      }
    }

  private[sources] def streamSchema(
      sqlContext: SQLContext, path: String,
      userSchema: Option[StructType]): StructType =
    userSchema.getOrElse {
      val v = VersionedTable.latestVersion(path)
      require(v >= 0,
        s"graft-versioned stream needs an existing table or an " +
          s"explicit schema — nothing committed at $path")
      GraftVersioned.snapshotSchema(
        sqlContext.sparkSession,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.singletonMap("path", path)))
    }
}
