package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.VersionedTable

/** CHANGE DATA FEED through plain read options — CDC consumers stay in
  * `spark.read` instead of calling the library:
  *
  * {{{
  *   spark.read.format("graft-versioned")
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", 2)    // first commit INCLUDED (>=1)
  *     .option("endingVersion", 5)      // default: latest
  *     .load(tablePath)                 // rows + (change, commit_version)
  * }}}
  *
  * A change feed is a multiset diff per commit ([[VersionedTable
  * .tableChanges]]) — relational algebra (per-commit exceptAll over
  * only the UNSHARED files), not a leaf scan — so it enters the query
  * as a PLAN SUBSTITUTION: [[GraftChangeFeedRule]], injected by
  * [[graft.GraftExtensions]], replaces the DataSourceV2Relation with
  * the change-feed plan during analysis (the same extension-rule shape
  * Delta uses for its CDF relation). Catalyst then optimizes the whole
  * tree together. Sessions without the extension fail LOUDLY at scan
  * build rather than silently serving the snapshot as if it were
  * changes.
  */
object GraftChangeFeed {

  def isChangeFeed(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.trim.toBoolean)

  /** (fromV, toV) for tableChanges — commits fromV+1..toV serve, so the
    * INCLUSIVE `startingVersion` option maps to fromV = start-1.
    * Version 0 has no predecessor to diff against (its "change" is the
    * whole initial snapshot), hence start >= 1 — same stance as Delta,
    * where CDF begins at the first commit after table creation.
    * Timestamp forms (epoch millis, Delta semantics): a version option
    * wins over its timestamp sibling; `startingTimestamp` resolves to
    * the first commit AT or AFTER the probe, `endingTimestamp` to the
    * last commit AT or BEFORE it (the commit clock is strictly
    * monotonic, so both are unambiguous).
    */
  private def range(path: String,
                    options: CaseInsensitiveStringMap): (Int, Int) = {
    val latest = VersionedTable.latestVersion(path)
    require(latest >= 0, s"no graft-versioned table at $path")
    val start = Option(options.get("startingVersion"))
      .map(_.trim.toInt)
      .orElse(Option(options.get("startingTimestamp")).map { t =>
        val probe = t.trim.toLong
        val v = VersionedTable.history(path)
          .find(_.tsMillis.exists(_ >= probe)).map(_.version)
          .getOrElse(throw new IllegalArgumentException(
            s"readChangeFeed startingTimestamp $probe is after the " +
              s"last commit at $path — nothing to serve"))
        // a probe at/before table creation clamps to the first
        // DIFFable commit (v0's "change" is the whole initial
        // snapshot — read the snapshot, not the feed)
        math.max(v, 1)
      })
      .getOrElse(1)
    val end = Option(options.get("endingVersion"))
      .map(_.trim.toInt)
      .orElse(Option(options.get("endingTimestamp")).map(t =>
        VersionedTable.versionAsOfTimestamp(path, t.trim.toLong)))
      .getOrElse(latest)
    require(start >= 1,
      s"readChangeFeed startingVersion must be >= 1, got $start")
    require(end <= latest,
      s"readChangeFeed endingVersion $end exceeds latest $latest")
    require(start <= end,
      s"readChangeFeed range empty: startingVersion $start > " +
        s"endingVersion $end")
    (start - 1, end)
  }

  def dataFrame(spark: SparkSession,
                options: CaseInsensitiveStringMap): DataFrame = {
    val path = GraftVersioned.tablePath(options)
    val (fromV, toV) = range(path, options)
    VersionedTable.tableChanges(spark, path, fromV, toV)
  }
}

/** Analysis-rule substitution: a graft-versioned relation loaded with
  * `readChangeFeed=true` becomes the change-feed plan, its output
  * aliased onto the relation's attribute ids so every parent operator
  * resolves unchanged.
  */
class GraftChangeFeedRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def isCdfRelation(p: LogicalPlan): Boolean = p match {
    case r: DataSourceV2Relation =>
      r.table.isInstanceOf[GraftVersionedTable] &&
        GraftChangeFeed.isChangeFeed(r.options)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fast bail: resolveOperatorsUp pays per-node bookkeeping on EVERY
    // analysis iteration of EVERY query in the session — a plain
    // existence fold first keeps the no-CDF cost at a tree walk
    if (!plan.exists(isCdfRelation)) return plan
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
        if r.table.isInstanceOf[GraftVersionedTable] &&
          GraftChangeFeed.isChangeFeed(r.options) =>
        val child = GraftChangeFeed.dataFrame(spark, r.options)
          .queryExecution.analyzed
        val byName = child.output
          .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        Project(r.output.map { o =>
          val src = byName.getOrElse(
            o.name.toLowerCase(java.util.Locale.ROOT),
            throw new IllegalStateException(
              s"change feed lost column ${o.name} — table evolved " +
                "between schema inference and planning; re-run the read"))
          Alias(src, o.name)(exprId = o.exprId)
        }, child)
    }
  }
}
