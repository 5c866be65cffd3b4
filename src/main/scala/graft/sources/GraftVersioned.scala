package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.VersionedTable

/** DataSource V2 read surface for [[graft.ops.VersionedTable]] — the
  * r10 verdict's top item: the storage layer's manifest consultation
  * (snapshot pinning + zone-stat file skipping) now runs INSIDE
  * Catalyst's planning instead of as library-side file-list plumbing,
  * so a plain `spark.read` / SQL user gets time travel and pruning
  * with no graft API in sight:
  *
  * {{{
  *   spark.read.format("graft-versioned")
  *     .option("versionAsOf", 2)       // omit for the latest snapshot
  *     .load(tablePath)
  *     .where("bucket >= 300 AND bucket < 700")   // prunes files
  * }}}
  *
  * How it engages the planner: Spark's V2 pushdown rule hands the data
  * predicates to [[GraftVersionedScanBuilder.pushFilters]]
  * (`SupportsPushDownFilters`) and the projection to `pruneColumns`
  * (`SupportsPushDownRequiredColumns`). `build()` then consults the
  * pinned version's manifest — every data file whose `zs` stats band
  * (written by `VersionedTable.compactClustered`) cannot intersect the
  * conjunctive bounds on its clustered column is dropped WITHOUT being
  * opened; files without stats always scan (conservative). The
  * surviving file list becomes a [[ParquetScan]] — Spark's own
  * vectorized, whole-stage-codegen parquet read path — with the same
  * filters pushed on for row-group pruning, so `EXPLAIN` shows a
  * `BatchScan ... PushedFilters: [...]` whose file count IS the pruned
  * count (pinned in PlanSpec). All pushed filters are also returned as
  * residuals, so Spark re-evaluates them post-scan: both pruning
  * levels are conservative, never semantic.
  *
  * Scale: manifest consultation is driver-side and file-count-sized
  * (exactly like Delta/Iceberg planning); data never moves until the
  * distributed ParquetScan executes.
  *
  * Deletion vectors: a snapshot carrying un-compacted vectors cannot
  * be served through a bare file scan (the anti-join belongs to the
  * library read path), so the scan REFUSES loudly rather than
  * resurrect deleted rows — run OPTIMIZE (`compact*`) first, or read
  * via `VersionedTable.read`.
  */
class GraftVersioned extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftVersioned.snapshotSchema(SparkSession.active, options)

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftVersionedTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object GraftVersioned {

  private[sources] def tablePath(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-versioned needs a path — spark.read.format(...).load(path)"))

  /** The pinned snapshot: `versionAsOf` option, else `timestampAsOf`
    * (epoch millis, resolved through the manifests' strictly-monotonic
    * commit timestamps), else the latest.
    */
  private[sources] def version(options: CaseInsensitiveStringMap): Int = {
    val path = tablePath(options)
    Option(options.get("versionAsOf")).map(_.trim.toInt)
      .orElse(Option(options.get("timestampAsOf")).map(t =>
        VersionedTable.versionAsOfTimestamp(path, t.trim.toLong)))
      .getOrElse {
        val v = VersionedTable.latestVersion(path)
        require(v >= 0, s"no graft-versioned table at $path")
        v
      }
  }

  private[sources] def snapshotSchema(
      spark: SparkSession, options: CaseInsensitiveStringMap): StructType = {
    val path = tablePath(options)
    val m = VersionedTable.readManifest(path, version(options))
    spark.read.option("mergeSchema", "true")
      .parquet(m.data.map(r => VersionedTable.absPath(path, r)): _*)
      .schema
  }
}

class GraftVersionedTable(tableSchema: StructType,
                          tableOptions: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String =
    s"graft_versioned(${GraftVersioned.tablePath(tableOptions)}, " +
      s"v${GraftVersioned.version(tableOptions)})"

  override def schema(): StructType = tableSchema

  // BATCH_WRITE rides along with V1_BATCH_WRITE: DataFrameWriter's
  // TableProvider path gates on the former even when the write itself
  // is the V1 fallback (the physical planner then dispatches on the
  // returned V1Write, never calling toBatch)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Catalog-resolved relations pass EMPTY scan options (the path
    * lives in the table's own options), path reads pass everything in
    * the scan options — merge with scan options winning.
    */
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (tableOptions.asScala ++ options.asScala).asJava)
    new GraftVersionedScanBuilder(SparkSession.active, tableSchema, merged)
  }

  /** WRITE path, via the V1 fallback (the Delta-on-Spark shape): the
    * connector's job is the COMMIT protocol, not the file encoding, and
    * `VersionedTable.append`/`init` already are the commit protocol —
    * a distributed parquet write followed by one atomic manifest
    * creation. So `df.write.format("graft-versioned").mode("append")`
    * and SQL `INSERT INTO` mint a new manifest version (existing files
    * untouched), `mode("overwrite")` / `INSERT OVERWRITE` re-inits.
    * Snapshot isolation holds for free: concurrent readers pinned an
    * older manifest and never see the in-flight commit.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftVersionedWriteBuilder(
      GraftVersioned.tablePath(
        if (info.options.containsKey("path")) info.options
        else tableOptions))
}

class GraftVersionedWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit = {
          val exists = graft.ops.VersionedTable.latestVersion(path) >= 0
          if (overwrite || legacyOverwrite || !exists)
            graft.ops.VersionedTable.init(data, path)
          else
            graft.ops.VersionedTable.append(data, path)
        }
      }
  }
}

class GraftVersionedScanBuilder(spark: SparkSession,
                                dataSchema: StructType,
                                options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val path = GraftVersioned.tablePath(options)
  private val version = GraftVersioned.version(options)

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = dataSchema

  /** Accept every translatable filter for manifest + row-group pruning,
    * and return ALL of them as residuals — Spark keeps its post-scan
    * Filter, so both pruning levels stay conservative.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Conjunctive numeric bounds per column, closed on both ends (a
    * strict bound relaxed to closed only ever keeps MORE files).
    */
  private def bounds(fs: Seq[Filter]): Map[String, (Double, Double)] = {
    val m = scala.collection.mutable.Map.empty[String, (Double, Double)]
    def upd(c: String, lo: Double, hi: Double): Unit = {
      val (l, h) = m.getOrElse(c,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      m(c) = (math.max(l, lo), math.min(h, hi))
    }
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    fs.foreach {
      case GreaterThan(c, v) =>
        num(v).foreach(d => upd(c, d, Double.PositiveInfinity))
      case GreaterThanOrEqual(c, v) =>
        num(v).foreach(d => upd(c, d, Double.PositiveInfinity))
      case LessThan(c, v) =>
        num(v).foreach(d => upd(c, Double.NegativeInfinity, d))
      case LessThanOrEqual(c, v) =>
        num(v).foreach(d => upd(c, Double.NegativeInfinity, d))
      case EqualTo(c, v) => num(v).foreach(d => upd(c, d, d))
      case And(l, r) => bounds(Seq(l, r)).foreach {
        case (c, (lo, hi)) => upd(c, lo, hi)
      }
      case _ => ()
    }
    m.toMap
  }

  /** Equality probes on bloom-indexed columns, as (column, literal). */
  private def equalityProbes(fs: Seq[Filter]): Seq[(String, Any)] =
    fs.flatMap {
      case EqualTo(c, v) => Seq(c -> v)
      case And(l, r) => equalityProbes(Seq(l, r))
      case _ => Nil
    }

  // -------- metadata-only COUNT(*) (aggregate pushdown) -------- //
  // Spark offers the aggregate only after every filter was fully
  // pushed; this source returns ALL filters as residuals, so an
  // aggregate arrives here only for unfiltered scans — exactly the
  // case the manifest can answer. Complete pushdown is accepted for a
  // bare, group-free COUNT(*) when VersionedTable.metadataCount is
  // valid (every file footer-counted, no deletion vectors); everything
  // else falls back to the real scan.
  private var pushedCount: Option[Long] = None

  private def countable(agg: Aggregation): Option[Long] =
    if (pushed.isEmpty && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar])
      VersionedTable.metadataCount(path, version)
    else None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    countable(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    countable(agg) match {
      case some @ Some(_) => pushedCount = some; true
      case None => false
    }

  override def build(): Scan = pushedCount match {
    case Some(n) => new GraftMetadataCountScan(path, version, n)
    case None => buildFileScan()
  }

  private def buildFileScan(): Scan = {
    val m = VersionedTable.readManifest(path, version)
    require(m.dvs.isEmpty,
      s"graft-versioned scan of $path v$version: snapshot carries " +
        "deletion vectors — OPTIMIZE (compact) first, or read via " +
        "VersionedTable.read")
    // manifest consultation: drop every file whose recorded stats bands
    // cannot intersect the pushed bounds — ALL recorded columns must
    // intersect (conjunctive), so a z-order layout prunes on a 2-D box
    val b = bounds(pushed.toSeq)
    val statsKeep = m.data.filter { rel =>
      m.stats.get(rel) match {
        case Some(byCol) =>
          byCol.forall { case (zc, (zmin, zmax)) =>
            b.get(zc).forall { case (lo, hi) => zmax >= lo && zmin <= hi }
          }
        case None => true
      }
    }
    // bloom consultation: an equality probe on a bloom-indexed column
    // keeps only candidate files (+ files the sidecar doesn't cover)
    val bloomCols = m.blooms.map(_.keyCol).toSet
    val keep = equalityProbes(pushed.toSeq)
      .filter { case (c, _) => bloomCols.contains(c) }
      .foldLeft(statsKeep) { case (files, (c, v)) =>
        val (open, _) = VersionedTable.keyLookupFiles(
          spark, path, version, c,
          org.apache.spark.sql.functions.lit(v))
        val openSet = open.toSet
        files.filter(openSet.contains)
      }
    val index = new InMemoryFileIndex(spark,
      keep.map(r => new HPath(VersionedTable.absPath(path, r))),
      Map.empty, Some(dataSchema))
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(
        options.asScala.toMap),
      index, dataSchema, required, new StructType(), pushed, options)
  }
}


/** A Scan that answers a pushed COUNT(*) from the version manifest's
  * footer row counts: ONE input partition, ONE row, ZERO data files
  * opened. `EXPLAIN` shows this class in the BatchScan — the pin that
  * the metadata path actually engaged.
  */
class GraftMetadataCountScan(path: String, version: Int, n: Long)
    extends Scan with Batch {
  override def readSchema(): StructType =
    new StructType().add("count_star", org.apache.spark.sql.types
      .LongType, nullable = false)
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftCountPartition(n))
  override def createReaderFactory(): PartitionReaderFactory =
    GraftCountReaderFactory
  override def description(): String =
    s"graft_versioned_metadata_count($path, v$version, rows=$n)"
}

case class GraftCountPartition(n: Long) extends InputPartition

object GraftCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow(
          p.asInstanceOf[GraftCountPartition].n)
      override def close(): Unit = ()
    }
}
