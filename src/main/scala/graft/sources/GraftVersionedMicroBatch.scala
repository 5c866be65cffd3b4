package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.VersionedTable

/** A table VERSION as a streaming offset. `json` is the bare number —
  * the same wire form the V1 source's LongOffset wrote, so existing
  * checkpoints parse.
  */
case class GraftVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** DataSource V2 micro-batch stream over a versioned table — the r11
  * verdict's item 2: the V1 `execution.streaming.Source` port, now on
  * the public connector API, WITH ADMISSION CONTROL. Offsets are
  * committed manifest versions; a micro-batch (start, end] reads
  * exactly the data files ADDED by manifests start+1..end (append-only
  * change feed; non-append commits refuse loudly unless
  * `ignoreChanges=true` — the shared [[GraftVersionedStreamSource]]
  * discipline).
  *
  * Admission control (the production cold-start shape): a standing
  * backlog of thousands of versions no longer becomes ONE giant first
  * batch —
  *   - `maxVersionsPerTrigger=N` serves at most N versions per batch;
  *   - `maxFilesPerTrigger=N` accumulates versions until their added
  *     files reach N (always at least one version, so progress is
  *     guaranteed even when a single commit exceeds the budget).
  * Both compose (the tighter bound wins per batch). Trigger.AvailableNow
  * pins the target version at start (SupportsTriggerAvailableNow), so
  * a rate-limited catch-up terminates deterministically while later
  * commits wait for the next run.
  *
  * Each batch plans Spark's own vectorized [[ParquetScan]] over the
  * batch's file list with the stream's pruned schema and pushed
  * filters — executor-distributed, whole-stage-codegen'd; the driver
  * only diffs manifests.
  */
class GraftVersionedMicroBatchStream(
    spark: SparkSession,
    path: String,
    options: CaseInsensitiveStringMap,
    streamSchema: StructType,
    requiredSchema: StructType,
    pushed: Array[Filter])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val startingVersion = GraftVersionedStreamSource.resolveStart(
    path, Option(options.get("startingVersion")),
    Option(options.get("startingTimestamp")))
  private val ignoreChanges =
    Option(options.get("ignoreChanges")).exists(_.trim.toBoolean)
  private val maxVersionsPerTrigger =
    Option(options.get("maxVersionsPerTrigger")).map(_.trim.toInt)
  private val maxFilesPerTrigger =
    Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)
  require(maxVersionsPerTrigger.forall(_ > 0),
    "maxVersionsPerTrigger must be positive")
  require(maxFilesPerTrigger.forall(_ > 0),
    "maxFilesPerTrigger must be positive")
  /** BOUNDED REPLAY (r13 verdict #7): an inclusive upper version.
    * The stream never serves past it — batch `tableChanges(from, to)`
    * parity for backfills: replay commits start..ending into a sink,
    * terminate under AvailableNow, and later commits wait for a run
    * with a later (or no) bound. Composes with pacing options.
    */
  private val endingVersion =
    Option(options.get("endingVersion")).map(_.trim.toLong)
  require(endingVersion.forall(_ >= startingVersion),
    s"endingVersion must be >= startingVersion ($startingVersion)")

  private def capEnd(v: Long): Long =
    endingVersion.map(math.min(v, _)).getOrElse(v)

  /** Pinned catch-up target under Trigger.AvailableNow. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(math.max(capEnd(VersionedTable.latestVersion(path).toLong),
        startingVersion - 1L))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset =
    GraftVersionOffset(math.max(startingVersion - 1L,
      // an empty table with startingVersion=0 starts at the -1 marker
      -1L))

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def reportLatestOffset(): Offset =
    GraftVersionOffset(
      math.max(capEnd(VersionedTable.latestVersion(path).toLong),
        startingVersion - 1L))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val latest = availableNowTarget.getOrElse(
      math.max(capEnd(VersionedTable.latestVersion(path).toLong),
        startingVersion - 1L))
    if (latest <= s) return GraftVersionOffset(s)
    var end = latest
    maxVersionsPerTrigger.foreach(mv =>
      end = math.min(end, s + mv))
    maxFilesPerTrigger.foreach { mf =>
      // accumulate versions until the file budget is spent; always
      // admit at least one version so the stream can't stall. One
      // commitChanges per candidate version — O(1) manifest reads for
      // delta commits, and a vacuumed predecessor surfaces through the
      // shared descriptive error instead of a raw require (r12 ADVICE:
      // this loop re-read two full manifests per step)
      var v = s + 1
      var files = 0L
      var last = s + 1
      while (v <= end && (files == 0L || files < mf)) {
        files +=
          (if (v == 0)
            VersionedTable.readManifest(path, 0).data.length
          else
            GraftVersionedStreamSource.changesOf(path, v.toInt)._1.length)
        last = v
        v += 1
      }
      end = math.min(end, last)
    }
    GraftVersionOffset(end)
  }

  /** The batch's ParquetScan, stashed for createReaderFactory. */
  @volatile private var currentScan: ParquetScan = _

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val fromV = start.asInstanceOf[GraftVersionOffset].v + 1
    val toV = end.asInstanceOf[GraftVersionOffset].v
    val files =
      if (fromV > toV) Seq.empty[String]
      else GraftVersionedStreamSource.addedFiles(
        path, ignoreChanges, fromV.toInt, toV.toInt)
    val index = new InMemoryFileIndex(spark,
      files.map(r => new HPath(VersionedTable.absPath(path, r))),
      Map.empty, Some(streamSchema))
    currentScan = ParquetScan(spark,
      spark.sessionState.newHadoopConf(),
      index, streamSchema, requiredSchema, new StructType(),
      pushed, options)
    currentScan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    require(currentScan != null,
      "createReaderFactory before planInputPartitions")
    currentScan.toBatch.createReaderFactory()
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftVersionedMicroBatchStream[$path, startingVersion=" +
      s"$startingVersion, maxVersionsPerTrigger=" +
      s"${maxVersionsPerTrigger.getOrElse(-1)}, maxFilesPerTrigger=" +
      s"${maxFilesPerTrigger.getOrElse(-1)}]"
}
