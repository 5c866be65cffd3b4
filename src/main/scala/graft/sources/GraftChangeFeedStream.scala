package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.VersionedTable

/** STREAMING CHANGE FEED (r12 verdict #3):
  *
  * {{{
  *   spark.readStream.format("graft-versioned")
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", 1)     // first commit served
  *     .load(path)   // rows + (change, commit_version), per commit
  * }}}
  *
  * Offsets are table versions (the snapshot stream's wire form, so
  * checkpoints restart identically) and each micro-batch serves the
  * PER-COMMIT row diffs of (start, end] — the q498 batch-CDF algebra
  * driven as a stream, with the same admission-control pacing
  * (`maxVersionsPerTrigger` / `maxFilesPerTrigger`,
  * Trigger.AvailableNow pinning; both spec-pinned on this path) and
  * the same bounded-replay upper bound (`endingVersion`, inclusive —
  * batch `tableChanges(from, to)` parity for backfills).
  *
  * The crucial design constraint: a streaming batch must be LEAF SCANS
  * ONLY — re-running the batch CDF's `exceptAll` plans inside the
  * incremental execution would risk stateful (mis)planning. The delta
  * log makes the scan-only form possible:
  *
  *   - an APPEND commit's diff is exactly its added files → normal
  *     parquet splits tagged `change='added'`;
  *   - a DELETION-VECTOR commit's diff is exactly the tombstoned
  *     (file, position) pairs its sidecars added → the file is read in
  *     storage order emitting ONLY those positions, tagged
  *     `change='removed'` (the inverse of [[GraftDvReaderFactory]]'s
  *     skip) — exact removed rows, no join;
  *   - a COPY-ON-WRITE commit carrying write-time CDC sidecars
  *     ([[graft.ops.VersionedTable.enableChangeDataFeed]]) serves as a
  *     leaf scan of those `_change`-tagged files (the exact multiset
  *     diff, recorded at write time — Delta's enableChangeDataFeed
  *     shape); without sidecars it REFUSES loudly (exactly Delta's
  *     stance) unless `skipChangeCommits=true` skips it, pointing the
  *     user at batch `readChangeFeed`, whose exceptAll algebra handles
  *     any commit shape. Merge-on-read DML needs no sidecars at all —
  *     its commits ARE adds + DV positions, served exactly.
  *
  * Entry point: [[GraftVersionedTable.newScanBuilder]] returns a
  * change-feed scan when the options carry readChangeFeed — its
  * `toMicroBatchStream` routes here, while `toBatch` keeps the loud
  * no-extensions refusal (batch CDF substitutes through
  * [[GraftChangeFeedRule]] during analysis and never builds the scan).
  */
class GraftChangeFeedMicroBatchStream(
    spark: SparkSession,
    path: String,
    options: CaseInsensitiveStringMap,
    cdfSchema: StructType)
    extends GraftVersionedMicroBatchStream(
      spark, path, GraftChangeFeedMicroBatchStream.withDefaultStart(options),
      cdfSchema, cdfSchema, Array.empty)
    with MicroBatchStream {

  // streaming CDF serves raw per-commit files/sidecars by PHYSICAL
  // name — refuse a mapped table rather than emit wrong column names
  // (batch tableChanges IS mapping-aware via diffVersions)
  require(!VersionedTable.mappingNontrivial(
    VersionedTable.readManifest(path,
      VersionedTable.latestVersion(path)).colMap),
    s"graft-versioned change-feed stream at $path: the table carries " +
      "a non-trivial column mapping (RENAME COLUMN history) — use " +
      "batch readChangeFeed, or OPTIMIZE (compact) first")

  private val skipChangeCommits =
    Option(options.get("skipChangeCommits")).exists(_.trim.toBoolean)

  /** Data columns = CDF schema minus the two tag columns. */
  private val dataSchema = StructType(cdfSchema.fields.dropRight(2))

  @volatile private var cdfScan: ParquetScan = _

  override def planInputPartitions(start: org.apache.spark.sql.connector
      .read.streaming.Offset, end: org.apache.spark.sql.connector.read
      .streaming.Offset): Array[InputPartition] = {
    val fromV = start.asInstanceOf[GraftVersionOffset].v + 1
    val toV = end.asInstanceOf[GraftVersionOffset].v
    // per version: added files, added-DV tombstones, and CoW commits'
    // write-time CDC sidecars
    val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val removedByFile = scala.collection.mutable.LinkedHashMap
      .empty[(String, Long), Array[Long]]
    val cdcByVersion = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long)]
    (fromV to toV).foreach { v =>
      val a = VersionedTable.commitActions(path, v.toInt)
      if (a.removedData.nonEmpty) {
        if (a.cdcFiles.nonEmpty)
          // the verb recorded its exact diff at write time — serve it
          cdcByVersion ++= a.cdcFiles.map(_ -> v)
        else if (!skipChangeCommits)
          throw new IllegalStateException(
            s"graft-versioned change-feed stream at $path: version $v " +
              s"rewrites data files (${a.removedData.size} removed) " +
              "without CDC sidecars — enable write-time CDC " +
              "(VersionedTable.enableChangeDataFeed) for exact CoW " +
              "diffs, use batch readChangeFeed (its exceptAll algebra " +
              "handles any commit shape), or skipChangeCommits=true")
      } else {
        added ++= a.addedData.map(_ -> v)
        if (a.addedDvs.nonEmpty) {
          val m = VersionedTable.readManifest(path, v.toInt)
          // ONLY this commit's sidecars: their positions ARE the rows
          // the commit removed
          val dvByFile = GraftVersioned.loadDvMap(spark, path, v.toInt,
            m.copy(dvs = a.addedDvs), m.data)
          dvByFile.foreach { case (rel, ps) =>
            removedByFile((rel, v)) = ps
          }
        }
      }
    }
    val allFiles = (added.map(_._1) ++ removedByFile.keys.map(_._1))
      .distinct.toSeq
    if (allFiles.isEmpty && cdcByVersion.isEmpty) {
      cdfScan = null; cdcScan = null; return Array.empty
    }
    // CDC-sidecar partitions: a second inner scan whose read schema
    // is dataSchema + the recorded `_change` column (positionally the
    // stream's own `change` slot — the reader appends only the version)
    cdcScan =
      if (cdcByVersion.isEmpty) null
      else {
        val cdcIndex = new InMemoryFileIndex(spark,
          cdcByVersion.map(r => new HPath(
            VersionedTable.absPath(path, r._1))).toSeq.distinct,
          Map.empty, Some(cdcReadSchema))
        ParquetScan(spark, spark.sessionState.newHadoopConf(),
          cdcIndex, cdcReadSchema, cdcReadSchema, new StructType(),
          Array.empty, options)
      }
    if (allFiles.isEmpty) {
      cdfScan = null
      return planCdcPartitions(cdcByVersion.toSeq, Nil).toArray
    }
    val index = new InMemoryFileIndex(spark,
      allFiles.map(r => new HPath(VersionedTable.absPath(path, r))),
      Map.empty, Some(dataSchema))
    cdfScan = ParquetScan(spark, spark.sessionState.newHadoopConf(),
      index, dataSchema, dataSchema, new StructType(),
      Array.empty, options)
    // regroup ParquetScan's splits per manifest file
    val splitsByRel = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[PartitionedFile]]
    cdfScan.toBatch.planInputPartitions().foreach {
      case fp: FilePartition => fp.files.foreach { pf =>
        val rel = GraftDvAwareScan.relRe
          .findFirstMatchIn(pf.filePath.toUri.getPath).map(_.group(1))
          .getOrElse(sys.error(
            s"change-feed stream: unmappable split ${pf.filePath}"))
        splitsByRel.getOrElseUpdate(rel,
          scala.collection.mutable.ArrayBuffer.empty) += pf
      }
      case other => sys.error(
        s"change-feed stream: unexpected partition $other")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    added.foreach { case (rel, v) =>
      splitsByRel.get(rel).foreach { splits =>
        // added files keep split parallelism — emission order is free
        splits.foreach(pf =>
          out += new GraftCdfPartition(out.length, Array(pf), v,
            "added", null))
      }
    }
    removedByFile.foreach { case ((rel, v), positions) =>
      splitsByRel.get(rel).foreach { splits =>
        // tombstone emission counts storage-order positions: ONE
        // partition per file, splits offset-sorted
        out += new GraftCdfPartition(out.length,
          splits.sortBy(_.start).toArray, v, "removed", positions)
      }
    }
    (out.toSeq ++ planCdcPartitions(cdcByVersion.toSeq, out.toSeq))
      .toArray
  }

  /** Stream schema's data columns + the recorded `_change`. */
  private def cdcReadSchema: StructType =
    StructType(dataSchema.fields :+
      org.apache.spark.sql.types.StructField("_change",
        org.apache.spark.sql.types.StringType, nullable = false))

  @volatile private var cdcScan: ParquetScan = _

  private def planCdcPartitions(cdc: Seq[(String, Long)],
                                prior: Seq[InputPartition])
      : Seq[InputPartition] = {
    if (cdc.isEmpty) return Nil
    val versionByRel = cdc.toMap
    var idx = prior.length
    cdcScan.toBatch.planInputPartitions().toSeq.flatMap {
      case fp: FilePartition => fp.files.toSeq.map { pf =>
        val rel = GraftDvAwareScan.relRe
          .findFirstMatchIn(pf.filePath.toUri.getPath).map(_.group(1))
          .getOrElse(sys.error(
            s"change-feed stream: unmappable CDC split ${pf.filePath}"))
        val v = versionByRel.getOrElse(rel, sys.error(
          s"change-feed stream: CDC split $rel not in the batch range"))
        idx += 1
        new GraftCdfCdcPartition(idx - 1, Array(pf), v): InputPartition
      }
      case other =>
        sys.error(s"change-feed stream: unexpected CDC partition $other")
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdfReaderFactory(
      if (cdfScan == null) null else cdfScan.toBatch.createReaderFactory(),
      if (cdcScan == null) null else cdcScan.toBatch.createReaderFactory())

  override def toString: String =
    s"GraftChangeFeedMicroBatchStream[$path]"
}

/** Scan builder for readChangeFeed options: streaming plans the real
  * [[GraftChangeFeedMicroBatchStream]]; a batch read reaching toBatch
  * means the extension rule did not substitute — refuse loudly rather
  * than serve the snapshot as if it were the change feed.
  */
class GraftChangeFeedScanBuilder(spark: SparkSession,
                                 cdfSchema: StructType,
                                 options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.read.ScanBuilder {
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = cdfSchema
    override def toBatch: Batch =
      throw new IllegalStateException(
        "readChangeFeed batch reads require the graft extensions " +
          "(spark.sql.extensions=graft.GraftExtensions or " +
          "SparkSession.builder.withExtensions) — refusing to serve " +
          "the snapshot as if it were the change feed")
    override def toMicroBatchStream(checkpointLocation: String)
        : MicroBatchStream =
      new GraftChangeFeedMicroBatchStream(spark,
        GraftVersioned.tablePath(options), options, cdfSchema)
    override def description(): String =
      s"graft_change_feed(${GraftVersioned.tablePath(options)})"
  }
}

object GraftChangeFeedMicroBatchStream {
  /** Batch CDF serves commits >= 1 by default (v0 has no predecessor
    * to diff); the stream matches unless told otherwise.
    */
  private def withDefaultStart(
      options: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    if (options.containsKey("startingVersion") ||
      options.containsKey("startingTimestamp")) options
    else {
      val m = new java.util.HashMap[String, String](options)
      m.put("startingVersion", "1")
      new CaseInsensitiveStringMap(m)
    }
  }
}

/** One change-feed unit: parquet splits + the commit tag; `positions`
  * null for 'added' (emit every row), else the sorted storage-order
  * row indices to EMIT as 'removed'.
  */
class GraftCdfPartition(
    idx: Int,
    fs: Array[PartitionedFile],
    val version: Long,
    val change: String,
    val positions: Array[Long])
    extends FilePartition(idx, fs)

/** A CDC-sidecar split: rows already carry `_change` in the change
  * slot; the reader appends only the commit version.
  */
class GraftCdfCdcPartition(
    idx: Int,
    fs: Array[PartitionedFile],
    val version: Long)
    extends FilePartition(idx, fs)

class GraftCdfReaderFactory(delegate: PartitionReaderFactory,
                            cdcDelegate: PartitionReaderFactory = null)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case c: GraftCdfCdcPartition =>
      val inner = cdcDelegate.createReader(FilePartition(c.index, c.files))
      val tag = new GenericInternalRow(Array[Any](c.version))
      val joined = new JoinedRow
      new PartitionReader[InternalRow] {
        override def next(): Boolean = inner.next()
        override def get(): InternalRow = joined(inner.get(), tag)
        override def close(): Unit = inner.close()
      }
    case c: GraftCdfPartition =>
      val inner = delegate.createReader(FilePartition(c.index, c.files))
      val tag = new GenericInternalRow(Array[Any](
        UTF8String.fromString(c.change), c.version))
      val joined = new JoinedRow
      if (c.positions == null)
        new PartitionReader[InternalRow] {
          override def next(): Boolean = inner.next()
          override def get(): InternalRow = joined(inner.get(), tag)
          override def close(): Unit = inner.close()
        }
      else
        new PartitionReader[InternalRow] {
          private var pos = -1L
          private var ti = 0
          override def next(): Boolean = {
            while (inner.next() && ti < c.positions.length) {
              pos += 1
              if (c.positions(ti) == pos) { ti += 1; return true }
            }
            false
          }
          override def get(): InternalRow = joined(inner.get(), tag)
          override def close(): Unit = inner.close()
        }
    case other => delegate.createReader(other)
  }
}
