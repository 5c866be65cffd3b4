package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType

/** DataSource V2 scan of a snapshot CARRYING DELETION VECTORS — the
  * merge-on-read half of SQL DML: after `DELETE FROM` commits a DV,
  * `SELECT` must keep working without an OPTIMIZE in between (r11
  * refused these snapshots outright).
  *
  * Mechanics: tombstones are (file, row-position) pairs recorded
  * against `_metadata.row_index`, i.e. a row's ordinal in FILE STORAGE
  * ORDER. The scan therefore arranges for emitted order to equal
  * storage order on tombstoned files and skips by counting:
  *
  *   - every split of a tombstoned file is coalesced into ONE input
  *     partition, splits sorted by byte offset (concatenation in
  *     offset order = file order); untombstoned files keep their
  *     normal split parallelism;
  *   - the inner [[ParquetScan]] carries NO pushed filters — a
  *     row-group skip would silently shift emitted ordinals off the
  *     recorded positions (Spark still applies the query's own Filter
  *     above the scan: this source always returns pushed filters as
  *     residuals);
  *   - columnar reads are disabled — the skip runs on the row
  *     iterator. A DV'd snapshot reads row-wise until OPTIMIZE folds
  *     the vectors in (the usual merge-on-read tax).
  *
  * The per-file tombstone lists ride INSIDE each file's own input
  * partition — no broadcast of the full vector, and the driver-side
  * materialization is bounded (fail-loud cap in the scan builder),
  * the same contract as every manifest probe in this engine.
  */
class GraftDvAwareScan(val inner: ParquetScan,
                       exactRows: Option[Long],
                       dvByFile: Map[String, Array[Long]],
                       streamFactory: Option[String =>
                         org.apache.spark.sql.connector.read
                           .streaming.MicroBatchStream] = None,
                       reportSchema: Option[StructType] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamFactory.map(_(checkpointLocation))
      .getOrElse(super.toMicroBatchStream(checkpointLocation))

  /** Exposed for plan tests/queries that pin the pruned file count. */
  def fileIndex: org.apache.spark.sql.execution.datasources
    .InMemoryFileIndex =
    inner.fileIndex.asInstanceOf[
      org.apache.spark.sql.execution.datasources.InMemoryFileIndex]

  override def readSchema(): StructType =
    reportSchema.getOrElse(inner.readSchema())
  override def toBatch: Batch = this

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.UNSUPPORTED

  /** Manifest-relative suffix of a split's (decoded) file path. */
  private def relOf(
      pf: org.apache.spark.sql.execution.datasources.PartitionedFile)
      : Option[String] = {
    val decoded = pf.filePath.toUri.getPath
    GraftDvAwareScan.relRe.findFirstMatchIn(decoded).map(_.group(1))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    val dvSplits = scala.collection.mutable.LinkedHashMap.empty[
      String, scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.datasources.PartitionedFile]]
    inner.toBatch.planInputPartitions().foreach {
      case fp: FilePartition =>
        val (tomb, plain) = fp.files.partition(f =>
          relOf(f).exists(dvByFile.contains))
        if (plain.nonEmpty) out += FilePartition(0, plain)
        tomb.foreach { f =>
          dvSplits.getOrElseUpdate(relOf(f).get,
            scala.collection.mutable.ArrayBuffer.empty) += f
        }
      case other => out += other // defensive; ParquetScan plans FilePartitions
    }
    dvSplits.foreach { case (rel, splits) =>
      out += new GraftDvFilePartition(0,
        splits.sortBy(_.start).toArray, dvByFile(rel))
    }
    // re-index (FilePartition.index is informational but keep it sane)
    out.zipWithIndex.map {
      case (fp: GraftDvFilePartition, i) =>
        new GraftDvFilePartition(i, fp.files, fp.tombstones): InputPartition
      case (fp: FilePartition, i) => FilePartition(i, fp.files): InputPartition
      case (p, _) => p
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDvReaderFactory(inner.toBatch.createReaderFactory())

  override def description(): String =
    s"${inner.description()} deletionVectors=${dvByFile.size} files"

  override def estimateStatistics(): Statistics = {
    val base = inner.estimateStatistics()
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        base.sizeInBytes()
      override def numRows(): java.util.OptionalLong =
        exactRows.map(java.util.OptionalLong.of)
          .getOrElse(base.numRows())
    }
  }
}

object GraftDvAwareScan {
  /** Same shape the executor-side `relExpr` extracts: commit dir +
    * optional partition subdir + part file.
    */
  private[sources] val relRe =
    "((?:[cd]\\d{5}|a[0-9a-f]{12})(?:/[^/]+=[^/]*)?/[^/]+)$".r
}

/** One tombstoned file's splits, offset-ordered, plus its sorted
  * deleted row positions.
  */
class GraftDvFilePartition(
    idx: Int,
    fs: Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
    val tombstones: Array[Long])
    extends FilePartition(idx, fs)

class GraftDvReaderFactory(delegate: PartitionReaderFactory)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case d: GraftDvFilePartition =>
      val r = delegate.createReader(d)
      val tombs = d.tombstones
      new PartitionReader[InternalRow] {
        private var pos = -1L
        private var ti = 0
        override def next(): Boolean = {
          while (r.next()) {
            pos += 1
            while (ti < tombs.length && tombs(ti) < pos) ti += 1
            if (ti >= tombs.length || tombs(ti) != pos) return true
          }
          false
        }
        override def get(): InternalRow = r.get()
        override def close(): Unit = r.close()
      }
    case other => delegate.createReader(other)
  }
}
