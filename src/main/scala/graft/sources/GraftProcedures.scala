package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.VersionedTable

/** SQL MAINTENANCE PROCEDURES (r12 verdict #7): the library verbs
  * exposed through Spark's stored-procedure API (the Iceberg `CALL`
  * shape — `ProcedureCatalog.loadProcedure`, new in Spark 4), so the
  * whole maintenance lifecycle is SQL:
  *
  * {{{
  *   CALL graft.system.optimize(table => 'tbl', target_files => 4)
  *   CALL graft.system.optimize(table => 'tbl', zorder_by => 'x,y')
  *   CALL graft.system.vacuum(table => 'tbl', keep_versions => 3)
  *   CALL graft.system.restore(table => 'tbl', version => 2)
  *   CALL graft.system.clone(source => 'tbl', target => 'tbl2')
  * }}}
  *
  * Each call runs the corresponding [[VersionedTable]] verb against the
  * catalog's warehouse and returns a one-row result set (committed
  * version / reclaim counts) through a tiny local Scan — Catalyst
  * binds named/positional arguments, applies declared defaults, and
  * type-checks against [[ProcedureParameter]] declarations.
  */
object GraftProcedures {

  /** Procedures live under the `system` namespace, Iceberg-style. */
  def load(warehouse: String,
           ident: org.apache.spark.sql.connector.catalog.Identifier)
      : UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"graft procedures live in the 'system' namespace, got $ident")
    val tablePath = (t: String) =>
      (warehouse +: t.split('.').toSeq).mkString("/")
    ident.name() match {
      case "optimize" => new GraftOptimizeProcedure(tablePath)
      case "vacuum" => new GraftVacuumProcedure(tablePath)
      case "restore" => new GraftRestoreProcedure(tablePath)
      case "clone" => new GraftCloneProcedure(tablePath)
      case "history" => new GraftHistoryProcedure(tablePath)
      case other => throw new UnsupportedOperationException(
        s"unknown graft procedure '$other' — available: optimize, " +
          "vacuum, restore, clone, history")
    }
  }

  def list(warehouse: String)
      : Array[org.apache.spark.sql.connector.catalog.Identifier] =
    Array("optimize", "vacuum", "restore", "clone", "history").map(n =>
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("system"), n))

  private[sources] def in(name: String,
                          dt: org.apache.spark.sql.types.DataType)
      : ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private[sources] def inDefault(
      name: String, dt: org.apache.spark.sql.types.DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()
}

/** Base: a named, deterministic-false bound procedure returning one
  * summary row.
  */
abstract class GraftProcedure(val name: String)
    extends UnboundProcedure with BoundProcedure {

  override def description(): String = s"graft $name"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  protected def resultRow(schema: StructType,
                          values: Seq[Any]): JIterator[Scan] =
    Collections.singletonList(
      new GraftProcedureResultScan(schema, values): Scan).iterator()

  protected def str(input: InternalRow, i: Int): String = {
    require(!input.isNullAt(i), s"$name: argument $i must be non-null")
    input.getUTF8String(i).toString
  }
}

class GraftOptimizeProcedure(tablePath: String => String)
    extends GraftProcedure("optimize") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.in("table", StringType),
    GraftProcedures.inDefault("target_files", IntegerType, "8"),
    GraftProcedures.inDefault("cluster_by", StringType, "NULL"),
    GraftProcedures.inDefault("zorder_by", StringType, "NULL"))

  override def call(input: InternalRow): JIterator[Scan] = {
    val spark = SparkSession.active
    val path = tablePath(str(input, 0))
    val target = input.getInt(1)
    val clusterBy =
      if (input.isNullAt(2)) None else Some(str(input, 2))
    val zorderBy =
      if (input.isNullAt(3)) None else Some(str(input, 3))
    (clusterBy, zorderBy) match {
      case (Some(c), None) =>
        VersionedTable.compactClustered(spark, path, target, c)
      case (None, Some(z)) =>
        z.split(',').map(_.trim).filter(_.nonEmpty) match {
          case Array(x, y) =>
            VersionedTable.compactClusteredZOrder(spark, path, target, x, y)
          case other => throw new IllegalArgumentException(
            s"zorder_by needs exactly two columns, got ${other.length}")
        }
      case (None, None) => VersionedTable.compact(spark, path, target)
      case _ => throw new IllegalArgumentException(
        "pass cluster_by OR zorder_by, not both")
    }
    val v = VersionedTable.latestVersion(path)
    resultRow(
      new StructType().add("version", IntegerType, nullable = false)
        .add("data_files", IntegerType, nullable = false),
      Seq(v, VersionedTable.manifestFiles(path, v).length))
  }
}

class GraftVacuumProcedure(tablePath: String => String)
    extends GraftProcedure("vacuum") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.in("table", StringType),
    GraftProcedures.in("keep_versions", IntegerType))

  override def call(input: InternalRow): JIterator[Scan] = {
    val path = tablePath(str(input, 0))
    val (manifests, files) = VersionedTable.vacuum(path, input.getInt(1))
    resultRow(
      new StructType()
        .add("manifests_removed", IntegerType, nullable = false)
        .add("files_removed", IntegerType, nullable = false),
      Seq(manifests, files))
  }
}

class GraftRestoreProcedure(tablePath: String => String)
    extends GraftProcedure("restore") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.in("table", StringType),
    GraftProcedures.in("version", IntegerType))

  override def call(input: InternalRow): JIterator[Scan] = {
    val path = tablePath(str(input, 0))
    VersionedTable.restore(path, input.getInt(1))
    resultRow(
      new StructType()
        .add("restored_version", IntegerType, nullable = false)
        .add("new_version", IntegerType, nullable = false),
      Seq(input.getInt(1), VersionedTable.latestVersion(path)))
  }
}

class GraftCloneProcedure(tablePath: String => String)
    extends GraftProcedure("clone") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.in("source", StringType),
    GraftProcedures.in("target", StringType))

  override def call(input: InternalRow): JIterator[Scan] = {
    val src = tablePath(str(input, 0))
    val dst = tablePath(str(input, 1))
    VersionedTable.cloneTable(src, dst)
    resultRow(
      new StructType()
        .add("cloned_files", IntegerType, nullable = false),
      Seq(VersionedTable.manifestFiles(dst, 0).length))
  }
}

/** The commit log as a result set — Delta's DESCRIBE HISTORY shape:
  * one row per retained version with its timestamp, file footprint,
  * and streaming batch tag.
  */
class GraftHistoryProcedure(tablePath: String => String)
    extends GraftProcedure("history") {

  override def parameters(): Array[ProcedureParameter] = Array(
    GraftProcedures.in("table", StringType))

  override def call(input: InternalRow): JIterator[Scan] = {
    val path = tablePath(str(input, 0))
    val rows = VersionedTable.history(path).map(c => Seq[Any](
      c.version, c.tsMillis.map(Long.box).orNull,
      c.dataFiles, c.dvFiles, c.batch.map(Long.box).orNull))
    val schema = new StructType()
      .add("version", IntegerType, nullable = false)
      .add("timestamp_ms", LongType)
      .add("data_files", IntegerType, nullable = false)
      .add("dv_files", IntegerType, nullable = false)
      .add("batch_id", LongType)
    Collections.singletonList(
      new GraftProcedureResultRowsScan(schema, rows): Scan).iterator()
  }
}

/** One-row LOCAL result set for a procedure call — Catalyst's
  * procedure invocation accepts only `LocalScan` outputs.
  */
class GraftProcedureResultScan(schema: StructType, values: Seq[Any])
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = Array(InternalRow(values.map {
    case s: String => UTF8String.fromString(s)
    case other => other
  }: _*))
}

/** Multi-row variant (the history procedure). */
class GraftProcedureResultRowsScan(schema: StructType,
                                   rowValues: Seq[Seq[Any]])
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = rowValues.map(vs =>
    InternalRow(vs.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }: _*)).toArray
}
