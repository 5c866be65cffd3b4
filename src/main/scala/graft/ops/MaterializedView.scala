package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.TableFs

/** Incremental materialized-view maintenance for keyed additive
  * aggregates — the storage/state pattern that turns "re-run the rollup
  * over the whole fact table" into "merge today's delta into yesterday's
  * answer". The MV holds `(keys, mv_n, mv_sum)` per group; a CDC delta
  * batch (rows tagged +1 insert / -1 delete in `opCol`) is aggregated to
  * per-key net effects and full-outer-merged into the MV. Groups whose
  * count reaches zero disappear, exactly as they would from a recompute.
  *
  * Cost model — the whole point at 100 TB: `applyDelta` reads the MV
  * (group-count-sized, orders of magnitude below the fact table) plus
  * the delta batch; the base fact table is NEVER rescanned — the API
  * cannot even name it. Correctness relies on the classic
  * delta-maintenance algebra for distributive aggregates (count/sum;
  * avg derives as mv_sum/mv_n): insert adds (+1, +v), delete subtracts,
  * and the merge is associative so any delta batching yields the same
  * MV as a from-scratch recompute — which is precisely what the q464
  * oracle checks.
  *
  * `valueCol` must be integral (the engine's cents discipline): sums
  * stay exact under any merge order, so MV state never accumulates
  * float drift across maintenance cycles.
  *
  * Storage is versioned (`v00000/`, `v00001/`, ...): each maintenance
  * cycle writes a NEW version directory and leaves the previous one
  * intact (write-then-swap — a reader never observes a half-written
  * MV, and a crashed maintenance job leaves the current version
  * untouched). A version becomes visible through a single `_commit`
  * file CREATED EXCLUSIVELY after its data lands — one atomic
  * create-if-absent is the commit point, and for streaming maintenance
  * the same file carries the batch id (see [[applyDeltaIdempotent]]),
  * so "version visible" and "batch recorded" cannot be split by a
  * crash. `read` serves the highest committed version.
  *
  * Concurrency contract: maintenance assumes a SINGLE WRITER per view
  * (the normal shape — one streaming query or one scheduled job owns a
  * view). The exclusive `_commit` create is the backstop: two
  * maintainers racing the same version both write data directories,
  * but only one commit succeeds — the loser ERRORS instead of silently
  * clobbering the winner's merge (the r10 check-then-act hazard). All
  * metadata I/O goes through the Hadoop FileSystem API
  * ([[graft.io.TableFs]]), so views live on local paths, HDFS, or
  * object stores alike.
  */
object MaterializedView {

  private def versionDir(path: String, v: Int): String = f"$path/v$v%05d"

  private def commitFile(path: String, v: Int): String =
    s"${versionDir(path, v)}/_commit"

  /** Highest committed version, -1 if none. Only versions with a
    * `_commit` file count — a crashed write leaves an orphan directory
    * that the next maintenance cycle simply overwrites.
    */
  def latestVersion(path: String): Int =
    TableFs.listNames(path)
      .filter(_.matches("v\\d{5}"))
      .filter(d => TableFs.exists(s"$path/$d/_commit"))
      .map(_.drop(1).toInt)
      .foldLeft(-1)(math.max)

  private def commit(path: String, v: Int, note: String): Unit =
    TableFs.writeUtf8Exclusive(commitFile(path, v), note)

  /** Build the MV from the base table — the ONE full scan the lifetime
    * of the view costs. Overwrites any existing version chain.
    */
  def create(base: DataFrame, keys: Seq[String], valueCol: String,
             path: String): Unit = {
    require(keys.nonEmpty, "MV needs at least one group key")
    TableFs.deleteRecursive(path)
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("mv_n"),
        sum(col(valueCol)).cast("long").as("mv_sum"))
      .write.mode(SaveMode.Overwrite).parquet(versionDir(path, 0))
    commit(path, 0, "")
  }

  private def mergeDelta(spark: SparkSession, path: String,
                         delta: DataFrame, keys: Seq[String],
                         valueCol: String, opCol: String): Int = {
    val v = latestVersion(path)
    require(v >= 0, s"no MV at $path — call create first")
    val mv = spark.read.parquet(versionDir(path, v))
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(opCol)).cast("long").as("d_n"),
        sum(col(opCol) * col(valueCol)).cast("long").as("d_sum"))
    mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("mv_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("mv_n"),
        (coalesce(col("mv_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("mv_sum")): _*)
      .where(col("mv_n") > 0)
      .write.mode(SaveMode.Overwrite).parquet(versionDir(path, v + 1))
    v + 1
  }

  /** Merge one CDC delta batch (opCol = +1 insert / -1 delete) into the
    * view: aggregate the delta per key, full-outer-merge with the
    * current version, drop emptied groups, commit as the next version.
    * O(|MV| + |delta|) — the base table is not an input.
    */
  def applyDelta(spark: SparkSession, path: String, delta: DataFrame,
                 keys: Seq[String], valueCol: String, opCol: String): Unit =
    commit(path, mergeDelta(spark, path, delta, keys, valueCol, opCol), "")

  /** Exactly-once variant for streaming maintenance (`foreachBatch`):
    * a RE-DELIVERED batch id is a no-op. Structured Streaming's
    * foreachBatch guarantee is at-least-once — after a crash between
    * sink write and checkpoint commit the same batch replays — so an
    * idempotence key is what upgrades the MV sink to exactly-once. The
    * batch id rides IN the `_commit` file, so recording it and making
    * the version visible are one atomic create-exclusive: a crash
    * before it leaves the old MV current and the batch unrecorded
    * (replay overwrites the orphan directory), a crash after leaves
    * both done.
    */
  def applyDeltaIdempotent(spark: SparkSession, path: String,
                           delta: DataFrame, keys: Seq[String],
                           valueCol: String, opCol: String,
                           batchId: Long): Unit = {
    if (appliedBatches(path).contains(batchId)) return
    commit(path, mergeDelta(spark, path, delta, keys, valueCol, opCol),
      s"batch=$batchId")
  }

  /** Batch ids already folded into the MV, across all versions. */
  def appliedBatches(path: String): Set[Long] =
    TableFs.listNames(path)
      .filter(_.matches("v\\d{5}"))
      .map(d => s"$path/$d/_commit")
      .filter(TableFs.exists)
      .map(TableFs.readUtf8)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").trim.toLong)
      .toSet

  /** Serve the current MV. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path)
    require(v >= 0, s"no MV at $path")
    spark.read.parquet(versionDir(path, v))
  }
}
