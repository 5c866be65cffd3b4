package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join WITHOUT an equality key — e.g. "every
  * event inside any attribution window". Spark's native plan for a pure
  * range predicate is BroadcastNestedLoopJoin: every point × every
  * interval. This operator bands time into fixed-width buckets so the
  * pair space becomes an equi-join:
  *
  *  - each interval explodes into every band it covers
  *    (⌈width/band⌉ rows — bounded fanout, chosen by the caller);
  *  - each point computes its single band;
  *  - equi-join on the band, then the exact range predicate.
  *
  * A point's band is unique, so a (point, interval) pair meets in exactly
  * one band — no post-join dedup. At 100 TB this is one shuffle on the
  * band key instead of a nested-loop over the full corpus; pick
  * `bandSeconds` ≈ the typical interval width so interval fanout stays
  * O(1) while bands stay selective.
  */
object RangeJoin {

  /** Exact epoch microseconds — Spark timestamps are µs-precision, and
    * band ids must be computed in INTEGER arithmetic: double epoch
    * seconds carry ~0.24µs of rounding near present-day epochs, enough
    * to push a timestamp within 1µs of a band boundary into the wrong
    * band (a silently dropped join pair).
    */
  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Floor-division band id from exact µs: `(us - pmod(us, b)) / b` —
    * the numerator is an exact multiple of `b`, so the double division
    * is exact, and pmod keeps the floor semantics for pre-1970 inputs.
    */
  private def bandOf(us: Column, bandUs: Long): Column =
    ((us - pmod(us, lit(bandUs))) / lit(bandUs)).cast("long")

  /** @param pointTs  column name in `points` (timestamp)
    * @param start    interval start column name in `intervals`, inclusive
    * @param end      interval end column name in `intervals`, exclusive
    * All three names must be distinct across the two inputs (rename
    * before calling — the join output carries both sides' columns).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, start: String, end: String,
                      bandSeconds: Long): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    val bandedInts = intervals
      // degenerate intervals (end <= start) match nothing — and must be
      // dropped BEFORE banding: Spark's sequence(a, b) generates a
      // DESCENDING range when b < a, which would explode a reversed
      // interval into every band between its endpoints
      .where(col(end) > col(start))
      .withColumn("__band",
        explode(sequence(
          bandOf(epochUs(col(start)), bandUs),
          // end is exclusive: an interval ending exactly on a band
          // boundary does not cover that band
          bandOf(epochUs(col(end)) - 1, bandUs))))
    val bandedPts = points.withColumn("__band",
      bandOf(epochUs(col(pointTs)), bandUs))
    bandedPts.join(bandedInts, "__band")
      .where(col(pointTs) >= col(start) && col(pointTs) < col(end))
      .drop("__band")
  }

  /** Interval×interval OVERLAP join (half-open intervals: overlap iff
    * `lStart < rEnd && rStart < lEnd`), banded the same way as
    * [[pointInInterval]] — both sides explode into the bands they cover
    * and meet through an equi-join on the band id.
    *
    * An overlapping pair co-occupies every band its overlap region
    * touches, so the join would duplicate it; instead of a post-join
    * `distinct` (a full extra shuffle carrying both payloads), each pair
    * is emitted ONLY in the band containing `max(lStart, rStart)` — the
    * first instant of the overlap, which both intervals cover by
    * definition. Dedup is thus a free per-row predicate.
    *
    * All four column names must be distinct across the two inputs.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bandSeconds: Long): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    def banded(df: DataFrame, start: String, end: String): DataFrame =
      df.where(col(end) > col(start))
        .withColumn("__band",
          explode(sequence(
            bandOf(epochUs(col(start)), bandUs),
            bandOf(epochUs(col(end)) - 1, bandUs))))
    banded(left, lStart, lEnd).join(banded(right, rStart, rEnd), "__band")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(bandOf(greatest(epochUs(col(lStart)), epochUs(col(rStart))), bandUs)
        === col("__band"))
      .drop("__band")
  }
}
