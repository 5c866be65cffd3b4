package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned table storage (poor-man's Delta/Iceberg): data
  * lives in immutable per-commit directories, and each version is a
  * MANIFEST — a tiny text file listing exactly the data files visible
  * at that version. Appends add files and never touch existing ones;
  * deletes are copy-on-write at file granularity (only files that
  * actually CONTAIN matching rows are rewritten without them — untouched
  * files carry over into the new manifest by reference). Readers pin a
  * manifest, so they see an immutable snapshot no matter what
  * maintenance runs concurrently, and `readVersion(v)` time-travels to
  * any historical state for free — the core primitive behind
  * reproducible training-data snapshots ("the exact corpus the
  * 2024-03 run trained on") at 100 TB, where copying the data per
  * version is unthinkable but copying a file LIST is nothing.
  *
  * Scale notes: manifests are file-count-sized; commit k's data dir is
  * written by a normal distributed parquet write; the affected-file
  * probe in [[deleteWhere]] is a column-pruned distributed scan of the
  * CURRENT file set only, and the rewrite reads only the affected
  * files. Nothing here is driver-sized except the file list itself.
  */
object VersionedTable {

  private def manifestDir(path: String): Path = Paths.get(path, "_manifests")

  private def manifestFile(path: String, v: Int): Path =
    manifestDir(path).resolve(f"v$v%05d.txt")

  /** Highest committed version, -1 if none. The manifest write is a
    * single atomic file creation, so a version either exists completely
    * or not at all.
    */
  def latestVersion(path: String): Int = {
    val d = manifestDir(path)
    if (!Files.exists(d)) -1
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d{5}\\.txt"))
      .map(_.slice(1, 6).toInt)
      .foldLeft(-1)(math.max)
  }

  /** Data files of version `v`, as `commitDir/partFile` relative paths. */
  def manifestFiles(path: String, v: Int): Seq[String] = {
    val f = manifestFile(path, v)
    require(Files.exists(f), s"no version $v at $path")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
  }

  private def writeCommitData(df: DataFrame, path: String,
                              commit: Int): Seq[String] = {
    val dir = f"$path/c$commit%05d"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir)
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
      .toSeq.sorted
      .map(n => f"c$commit%05d/$n")
  }

  private def commitManifest(path: String, v: Int,
                             files: Seq[String]): Unit = {
    Files.createDirectories(manifestDir(path))
    Files.write(manifestFile(path, v),
      files.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Create the table at version 0. */
  def init(df: DataFrame, path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    commitManifest(path, 0, writeCommitData(df, path, 0))
  }

  /** Append-only commit: new files join the manifest; no existing file
    * is read or rewritten.
    */
  def append(df: DataFrame, path: String): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path — call init first")
    commitManifest(path, v + 1,
      manifestFiles(path, v) ++ writeCommitData(df, path, v + 1))
  }

  /** Copy-on-write delete: files with no matching row carry over BY
    * REFERENCE; only files containing matches are rewritten (minus the
    * matching rows) into the new commit. Historical versions still see
    * the original files — they are never deleted, only de-referenced.
    */
  def deleteWhere(spark: SparkSession, path: String, pred: Column): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path — call init first")
    val cur = manifestFiles(path, v)
    val byTail = cur.map(rel => rel -> s"$path/$rel").toMap
    // distributed affected-file probe: one column-pruned pass over the
    // current snapshot; result is file-count-bounded
    val cap = 1000000
    val affectedAbs = spark.read
      .option("mergeSchema", "true")
      .parquet(cur.map(r => s"$path/$r"): _*)
      .where(pred)
      .select(input_file_name().as("file")).distinct()
      .limit(cap + 1).collect().map(_.getString(0))
    require(affectedAbs.length <= cap,
      s"affected-file set at $path exceeds $cap files")
    // input_file_name returns URIs (file:/...): match manifest entries
    // by their commitDir/partFile tail, unique per commit
    val affected = byTail.keys.toSeq
      .filter(rel => affectedAbs.exists(_.endsWith(rel))).sorted
    val carried = cur.filterNot(affected.contains)
    val rewritten =
      if (affected.isEmpty) Seq.empty[String]
      else writeCommitData(
        // keep every row where pred is not TRUE — `!pred` alone would
        // also drop pred-NULL rows, which the probe never selected
        spark.read.option("mergeSchema", "true")
          .parquet(affected.map(r => s"$path/$r"): _*)
          .where(coalesce(pred, lit(false)) === false),
        path, v + 1)
    commitManifest(path, v + 1, carried ++ rewritten)
  }

  /** Snapshot read of any historical version. `mergeSchema` makes the
    * read SCHEMA-EVOLUTION-aware: a version whose manifest mixes
    * pre-evolution and post-evolution files (an `append` introduced a
    * column) surfaces the union schema with legacy rows null-filled,
    * while older versions — whose manifests reference only
    * pre-evolution files — keep their original schema. Footer-merge
    * cost is bounded by the manifest's file count.
    */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(manifestFiles(path, v).map(r => s"$path/$r"): _*)

  /** Delta-style MERGE (upsert by key): every current row whose key
    * appears in `updates` is replaced by the update rows for that key;
    * update rows with unseen keys append. Copy-on-write at FILE
    * granularity, like [[deleteWhere]]: the affected-file probe
    * left-semi-joins the current snapshot against the (broadcast)
    * distinct update keys, so only files CONTAINING a matched key are
    * rewritten — a 100 TB table absorbing a point-update batch rewrites
    * the touched files, not the table, and every prior snapshot stays
    * pinned. `input_file_name` is captured at the scan projection
    * (before any join/exchange can detach rows from their source file).
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path — call init first")
    val cur = manifestFiles(path, v)
    val keys = broadcast(updates.select(keyCols.map(col): _*).distinct())
    val scan = spark.read.option("mergeSchema", "true")
      .parquet(cur.map(r => s"$path/$r"): _*)
      .withColumn("__file", input_file_name())
    val cap = 1000000
    val affectedAbs = scan.join(keys, keyCols, "left_semi")
      .select("__file").distinct()
      .limit(cap + 1).collect().map(_.getString(0))
    require(affectedAbs.length <= cap,
      s"affected-file set at $path exceeds $cap files")
    val affected = cur
      .filter(rel => affectedAbs.exists(_.endsWith(rel))).sorted
    val carried = cur.filterNot(affected.contains)
    val survivors =
      if (affected.isEmpty) updates.limit(0)
      else spark.read.option("mergeSchema", "true")
        .parquet(affected.map(r => s"$path/$r"): _*)
        .join(keys, keyCols, "left_anti")
    // allowMissingColumns: an update batch may CARRY a new column
    // (schema evolution through MERGE) or lack a recently-added one —
    // either side null-fills
    val rewritten = writeCommitData(
      survivors.unionByName(updates, allowMissingColumns = true),
      path, v + 1)
    commitManifest(path, v + 1, carried ++ rewritten)
  }

  /** OPTIMIZE-style compaction: rewrite the CURRENT snapshot into
    * `targetFiles` files as a new version — the small-files remedy
    * under version history (appends fragment the manifest one commit's
    * files at a time; compaction folds them without losing a single
    * historical snapshot, because old files are only de-referenced,
    * never deleted). Round-robin repartition: even file sizes, no
    * ordering assumption.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path — call init first")
    commitManifest(path, v + 1, writeCommitData(
      readVersion(spark, path, v).repartition(targetFiles), path, v + 1))
  }

  /** Multiset diff between two snapshots — `change` = 'added' (in vB,
    * not vA) / 'removed' (in vA, not vB) — reading ONLY the files the
    * manifests DON'T share: if A = S ⊎ Ao and B = S ⊎ Bo (S the shared
    * files' rows), then A∖B = Ao∖Bo and B∖A = Bo∖Ao, so the shared
    * bulk never enters the scan. That makes "what changed between the
    * 2024-03 and 2024-04 corpus snapshots" cost proportional to the
    * CHANGED files, not the table — on a 100 TB snapshot pair where one
    * commit touched 0.1% of files, the diff reads 0.1%. `exceptAll`
    * keeps multiset semantics (duplicate rows diff by multiplicity).
    */
  def diffVersions(spark: SparkSession, path: String, vA: Int,
                   vB: Int): DataFrame = {
    val aF = manifestFiles(path, vA)
    val bF = manifestFiles(path, vB)
    val shared = aF.toSet.intersect(bF.toSet)
    def rd(fs: Seq[String]): DataFrame =
      if (fs.nonEmpty) spark.read.option("mergeSchema", "true")
        .parquet(fs.map(r => s"$path/$r"): _*)
      else readVersion(spark, path, vA).where(lit(false))
    val ao0 = rd(aF.filterNot(shared))
    val bo0 = rd(bF.filterNot(shared))
    // schema-evolution alignment: a diff straddling an evolving commit
    // can leave one side without a later column — null-fill to the
    // union schema so exceptAll compares like for like (a legacy row
    // and its null-extended self are the same row, so evolution alone
    // never reports a change)
    val allCols = (ao0.columns ++ bo0.columns.filterNot(
      ao0.columns.contains)).toSeq
    val types = (bo0.schema ++ ao0.schema)
      .map(f => f.name -> f.dataType).toMap
    def align(df: DataFrame): DataFrame =
      allCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(types(c))))
        .select(allCols.map(col): _*)
    val ao = align(ao0)
    val bo = align(bo0)
    bo.exceptAll(ao).withColumn("change", lit("added"))
      .unionByName(ao.exceptAll(bo).withColumn("change", lit("removed")))
  }

  /** Read the current version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, latestVersion(path))
}
