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

  private def epochSec(c: Column): Column =
    c.cast("timestamp").cast("double")

  /** @param pointTs  column name in `points` (timestamp)
    * @param start    interval start column name in `intervals`, inclusive
    * @param end      interval end column name in `intervals`, exclusive
    * All three names must be distinct across the two inputs (rename
    * before calling — the join output carries both sides' columns).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, start: String, end: String,
                      bandSeconds: Long): DataFrame = {
    val bandedInts = intervals
      // degenerate intervals (end <= start) match nothing — and must be
      // dropped BEFORE banding: Spark's sequence(a, b) generates a
      // DESCENDING range when b < a, which would explode a reversed
      // interval into every band between its endpoints
      .where(col(end) > col(start))
      .withColumn("__band",
        explode(sequence(
          floor(epochSec(col(start)) / bandSeconds).cast("long"),
          // end is exclusive: an interval ending exactly on a band
          // boundary does not cover that band
          floor((epochSec(col(end)) - lit(1e-6)) / bandSeconds).cast("long"))))
    val bandedPts = points.withColumn("__band",
      floor(epochSec(col(pointTs)) / bandSeconds).cast("long"))
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
    def banded(df: DataFrame, start: String, end: String): DataFrame =
      df.where(col(end) > col(start))
        .withColumn("__band",
          explode(sequence(
            floor(epochSec(col(start)) / bandSeconds).cast("long"),
            floor((epochSec(col(end)) - lit(1e-6)) / bandSeconds).cast("long"))))
    banded(left, lStart, lEnd).join(banded(right, rStart, rEnd), "__band")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(floor(greatest(epochSec(col(lStart)), epochSec(col(rStart)))
        / bandSeconds).cast("long") === col("__band"))
      .drop("__band")
  }
}
