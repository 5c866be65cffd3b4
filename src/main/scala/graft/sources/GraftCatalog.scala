package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.TableFs
import graft.ops.VersionedTable

/** A Spark `TableCatalog` over a warehouse directory of versioned
  * tables — the final step of making the storage layer a first-class
  * SQL citizen: after
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  * }}}
  *
  * plain SQL drives the whole lifecycle with no graft API in sight:
  *
  * {{{
  *   CREATE TABLE graft.events_curated (event_id BIGINT, cents BIGINT)
  *   INSERT INTO graft.events_curated SELECT ...   -- manifest commit
  *   SELECT * FROM graft.events_curated            -- latest snapshot
  *   SELECT * FROM graft.events_curated VERSION AS OF 2  -- time travel
  * }}}
  *
  * `VERSION AS OF` resolves through `loadTable(ident, version)` — the
  * same Catalyst hook Delta/Iceberg use — and every read goes through
  * [[GraftVersionedTable]], so zone-stat and bloom file skipping apply
  * to catalog SQL exactly as to path reads. Writes ride the V1Write
  * fallback ([[GraftVersionedWriteBuilder]]): INSERT INTO appends a
  * manifest version, INSERT OVERWRITE re-inits.
  *
  * Identifiers map to directories: `graft.ns.tbl` →
  * `<warehouse>/ns/tbl`. A directory IS a table iff it has a
  * `_manifests` dir with at least one committed version. Renames are
  * unsupported (an object-store rename is a copy; snapshot ids are
  * path-bound) — fail loudly.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def isTable(path: String): Boolean =
    VersionedTable.latestVersion(path) >= 0

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    TableFs.listNames(dir)
      .filter(n => isTable(s"$dir/$n"))
      .sorted
      .map(n => Identifier.of(namespace, n))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(pathOf(ident))

  private def load(ident: Identifier, versionAsOf: Option[String]): Table = {
    val path = pathOf(ident)
    if (!isTable(path))
      throw new NoSuchTableException(
        catalogName +: ident.namespace().toSeq :+ ident.name())
    val opts = new CaseInsensitiveStringMap(
      (Map("path" -> path) ++ versionAsOf.map("versionAsOf" -> _)).asJava)
    new GraftVersionedTable(
      GraftVersioned.snapshotSchema(SparkSession.active, opts), opts)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF v` — Catalyst routes the literal here. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** SQL `TIMESTAMP AS OF ts` — Catalyst hands the literal as
    * MICROseconds since epoch; resolve through the manifests'
    * strictly-monotonic commit clock (same hook Delta/Iceberg use).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, Some(VersionedTable.versionAsOfTimestamp(
      pathOf(ident), timestampMicros / 1000L).toString))

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-versioned tables cluster via OPTIMIZE (compactClustered), " +
        "not static partitioning")
    val path = pathOf(ident)
    if (isTable(path))
      throw new TableAlreadyExistsException(
        (catalogName +: ident.namespace().toSeq :+ ident.name())
          .map(part => s"`$part`").mkString("."))
    val schema = new StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable())))
    val spark = SparkSession.active
    // version 0 = an empty snapshot carrying the declared schema
    // (repartition(1) forces exactly one schema-bearing part file — a
    // zero-partition empty frame would write none, leaving the version
    // unreadable)
    VersionedTable.init(
      spark.createDataFrame(new util.ArrayList[org.apache.spark.sql.Row](),
        schema).repartition(1), path)
    load(ident, None)
  }

  /** ALTER TABLE ADD/RENAME/DROP COLUMN: metadata-only manifest
    * commits — no data file is touched, old snapshots keep their
    * schema, constraints and stats survive. RENAME/DROP go through
    * column mapping (r13 verdict #3): the manifest records a
    * logical→physical name map, so a rename flips only the logical
    * name and a drop removes only the map entry — the physical column
    * stays in the immutable files and historical snapshots (whose
    * manifests carry the old map) still read it. RETYPE stays
    * unsupported: it would reinterpret bytes already written.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!isTable(path))
      throw new NoSuchTableException(
        catalogName +: ident.namespace().toSeq :+ ident.name())
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft catalog: nested ADD COLUMN is unsupported")
        VersionedTable.addColumn(SparkSession.active, path,
          add.fieldNames()(0), add.dataType())
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "graft catalog: nested RENAME COLUMN is unsupported")
        VersionedTable.renameColumn(SparkSession.active, path,
          ren.fieldNames()(0), ren.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "graft catalog: nested DROP COLUMN is unsupported")
        VersionedTable.dropColumn(SparkSession.active, path,
          del.fieldNames()(0))
      // ALTER TABLE t SET TBLPROPERTIES('graft.enableChangeDataFeed' =
      // 'true'|'false') — the Delta CDF table-property shape
      case set: TableChange.SetProperty
        if set.property() == "graft.enableChangeDataFeed" =>
        if (set.value().trim.toBoolean)
          VersionedTable.enableChangeDataFeed(path)
        else VersionedTable.disableChangeDataFeed(path)
      case unset: TableChange.RemoveProperty
        if unset.property() == "graft.enableChangeDataFeed" =>
        VersionedTable.disableChangeDataFeed(path)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — " +
          "ADD/RENAME/DROP COLUMN evolve the schema (retype would " +
          "reinterpret immutable historical files) and the " +
          "graft.enableChangeDataFeed property toggles CDC sidecars")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (!isTable(path)) false
    else { TableFs.deleteRecursive(path); true }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: rename is a copy on object stores and snapshot " +
        "ids are path-bound — create + insert + drop instead")

  // ---- SQL maintenance: CALL graft.system.<proc>(...) ---- //
  // optimize / vacuum / restore / clone through Spark's
  // stored-procedure API (r12 verdict #7) — see GraftProcedures.
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure =
    GraftProcedures.load(warehouse, ident)

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.toSeq == Seq("system")) GraftProcedures.list(warehouse)
    else Array.empty
}
