package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with time ≤ the
  * left row's time, within an equality-key group (the classic
  * point-in-time lookup; absent from both the reference and Spark's Scala
  * API — SURVEY.md §2b "joins" row). Returns the matched row's value
  * columns (`asof_<col>`), not just its timestamp — "price as of event
  * time" works out of the box.
  *
  * Spark-first formulation (preference order (a): compose built-ins), in
  * two stages:
  *
  *  1. '''Pre-aggregate the right side per (key, time)''' — one row per
  *     distinct (key, time) carrying the group count and a
  *     deterministically chosen payload (`max_by` over `tieBreak`, a
  *     unique right column). Semantics-preserving for any granularity,
  *     and the fanout-tamer at scale: the subsequent range join
  *     multiplies left rows by ''distinct times per key'', not by raw
  *     right rows — on a power-law key (one user with 1M same-day
  *     orders) that's the difference between a hot partition and a
  *     bounded one.
  *  2. Equi-join on the key with the range predicate, then per-left-row
  *     argmax via `max_by(…, time)` (time is unique per key group after
  *     stage 1, so the argmax is deterministic). Catalyst plans the
  *     equi-part as a hash/sort-merge join partitioned by the key and
  *     collapses the multiplication with map-side partial aggregation.
  *
  * At 100 TB: two key shuffles (pre-agg, join), no window over a global
  * sort, no custom operator needed (option (c) stays unnecessary).
  */
object AsOfJoin {

  /** @param payload  right columns returned from the matched (latest)
    *                 row as `asof_<name>`.
    * @param tieBreak unique right column ordering rows that share
    *                 (key, time) — required when `payload` is non-empty
    *                 so the lookup is deterministic.
    * @return left rows (selected cols) + `asof_time` = greatest right
    *         time ≤ left time + `n_prior` = count of right rows at or
    *         before + one `asof_<col>` per payload column; inner
    *         semantics (lefts with no match drop, like DuckDB ASOF JOIN).
    */
  /** @param maxStaleness optional tolerance (pandas `merge_asof
    *                     tolerance`): only right rows with
    *                     `time >= leftTime - maxStaleness` match, so a
    *                     stale quote never silently fills a fresh event.
    *                     Also the fanout bound at scale — the range join
    *                     multiplies by distinct times inside the
    *                     TOLERANCE WINDOW, not the key's full history
    *                     (`n_prior` then counts only in-window rows).
    */
  def lookupLatest(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftSelect: Seq[Column],
      payload: Seq[String] = Nil,
      tieBreak: Option[Column] = None,
      maxStaleness: Option[Column] = None): DataFrame = {
    require(payload.isEmpty || tieBreak.nonEmpty,
      "payload columns need a tieBreak column for a deterministic pick")
    val perTime = payload.map { c =>
      max_by(right(c), tieBreak.get).as(s"__p_$c")
    }
    val pre = right
      .groupBy(rightKey.as("__k"), rightTime.as("__t"))
      .agg(count(lit(1)).as("__cnt"), perTime: _*)
    val range = maxStaleness match {
      case Some(tol) =>
        col("__t") <= leftTime && col("__t") >= leftTime - tol
      case None => col("__t") <= leftTime
    }
    val joined = left.join(pre, leftKey === col("__k") && range)
    val tailAggs = sum("__cnt").cast("long").as("n_prior") +:
      payload.map(c => max_by(col(s"__p_$c"), col("__t")).as(s"asof_$c"))
    joined
      .groupBy(leftSelect: _*)
      .agg(max(col("__t")).as("asof_time"), tailAggs: _*)
  }

  /** Forward as-of: the EARLIEST right row with time ≥ the left row's
    * time ("next purchase after this error" / time-to-conversion). Same
    * two-stage shape as [[lookupLatest]] with the range and argmax
    * mirrored: `n_after` counts right rows at or after, payload is
    * min_by time.
    */
  def lookupEarliest(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftSelect: Seq[Column],
      payload: Seq[String] = Nil,
      tieBreak: Option[Column] = None): DataFrame = {
    require(payload.isEmpty || tieBreak.nonEmpty,
      "payload columns need a tieBreak column for a deterministic pick")
    val perTime = payload.map { c =>
      min_by(right(c), tieBreak.get).as(s"__p_$c")
    }
    val pre = right
      .groupBy(rightKey.as("__k"), rightTime.as("__t"))
      .agg(count(lit(1)).as("__cnt"), perTime: _*)
    val joined = left.join(pre, leftKey === col("__k") && col("__t") >= leftTime)
    val tailAggs = sum("__cnt").cast("long").as("n_after") +:
      payload.map(c => min_by(col(s"__p_$c"), col("__t")).as(s"asof_$c"))
    joined
      .groupBy(leftSelect: _*)
      .agg(min(col("__t")).as("asof_time"), tailAggs: _*)
  }
}
