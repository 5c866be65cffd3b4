package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches for single-pass statistics at 100 TB.
  *
  * Approximate quantiles via FIXED-WIDTH HISTOGRAM bins: one
  * aggregation builds the per-bin counts (mergeable map-side, bounded
  * state = #bins), then quantiles interpolate over the cumulative
  * histogram. Error is bounded by `binWidth` — and unlike
  * t-digest/GK-sketch implementations the result is DETERMINISTIC, so
  * the DuckDB oracle replays it exactly (q61): same bins, same
  * cumulative sums, same estimates, hash-equal. At scale the only
  * non-distributed step is the cumulative window over #bins rows (a few
  * thousand), not data rows.
  */
object Sketches {

  /** @return one row per requested quantile: (q, bin, est) where est is
    *         the midpoint of the first bin whose cumulative count
    *         reaches q·total — |est − exact quantile| ≤ binWidth.
    */
  def histogramQuantiles(spark: SparkSession, df: DataFrame, valueCol: String,
                         binWidth: Double, qs: Seq[Double]): DataFrame = {
    import spark.implicits._
    val bins = df
      .groupBy(floor(col(valueCol) / binWidth).as("bin"))
      .agg(count(lit(1)).as("c"))
    // cumulative over #bins rows (bounded by value-range/binWidth) — the
    // single-partition window is deliberate and small
    val byBin = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy()
    val cum = bins
      .withColumn("cum", sum("c").over(byBin))
      .withColumn("total", sum("c").over(all))
    broadcast(qs.toDF("q"))
      .crossJoin(cum)
      .where(col("cum") >= col("q") * col("total"))
      .groupBy("q").agg(min("bin").as("bin"))
      .withColumn("est", round((col("bin") + 0.5) * binWidth, 2))
      .orderBy("q")
  }
}
