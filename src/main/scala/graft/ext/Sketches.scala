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

  /** Grouped form of [[histogramQuantiles]]: per-group quantile
    * estimates with the same fixed-width-bin determinism. One MERGEABLE
    * aggregation whose state is the #(group, bin) pair count — bounded
    * by group-cardinality × value-range/binWidth, independent of row
    * count (the scale-safe replacement for per-group exact `percentile`,
    * whose buffer holds every group value). The cumulative window runs
    * over bins WITHIN a group (thousands of rows max per group), and
    * `est = (bin + 0.5) · binWidth` is exact double arithmetic, so
    * DuckDB replays results bit-identically (q125/q134 gates).
    *
    * @return one row per (group, q): est = midpoint of the first bin
    *         whose cumulative count reaches q·groupTotal;
    *         |est − exact group quantile| ≤ binWidth.
    */
  def groupedHistogramQuantiles(df: DataFrame, groupCol: String,
                                valueCol: String, binWidth: Double,
                                qs: Seq[Double]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got ${qs.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val bins = df
      .groupBy(col(groupCol), floor(col(valueCol) / binWidth).as("bin"))
      .agg(count(lit(1)).as("c"))
    val byBin = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(groupCol)
    val cum = bins
      .withColumn("cum", sum("c").over(byBin))
      .withColumn("total", sum("c").over(all))
    broadcast(qs.toDF("q"))
      .crossJoin(cum)
      .where(col("cum") >= col("q") * col("total"))
      .groupBy(col(groupCol), col("q"))
      .agg(min("bin").as("bin"))
      .withColumn("est", (col("bin") + 0.5) * binWidth)
  }

  /** EXACT heavy hitters via a Misra-Gries sketch pass + recheck — the
    * two-phase shape that finds "every value occurring > 1/k of the
    * time" without ever building the full frequency table in one
    * aggregation state.
    *
    * Phase 1 runs a k-counter Misra-Gries summary PER PARTITION
    * (`mapPartitions`, bounded O(k) memory regardless of partition size
    * or cardinality). MG guarantees any item with partition frequency
    * > N_p/(k+1) survives its partition's sketch, and an item with
    * global frequency > N/(k+1) must exceed that density in at least one
    * partition (averaging argument) — so the union of per-partition
    * survivors is a SUPERSET of every global heavy hitter: sketches can
    * over-report, never drop. Phase 2 restores exactness: a semi-join of
    * the data against the (tiny, broadcast) candidate set and an exact
    * count, filtered at the caller's threshold. q93 gates the end-to-end
    * result against DuckDB's plain GROUP BY/HAVING — which is precisely
    * the no-false-negative property.
    *
    * At 100 TB vs a plain groupBy: the full-shuffle aggregation keys on
    * EVERY distinct value (billions for tokens); here the shuffle only
    * carries values that look heavy somewhere — ≤ k·partitions keys.
    *
    * @param k sketch width; must satisfy N/(k+1) ≤ minCount or the
    *          superset guarantee does not cover the requested threshold
    *          (checked: increase k or raise minCount)
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
                   minCountOfTotal: Double): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minCountOfTotal > 1.0 / (k + 1),
      f"threshold ${minCountOfTotal}%f of total is below the k=$k sketch " +
        f"guarantee 1/(k+1)=${1.0 / (k + 1)}%f - heavy hitters could be dropped")
    val vals = df.select(col(valueCol).cast("string").as("v"))
    import vals.sparkSession.implicits._
    // one sketch pass emits BOTH the per-partition candidates (v, 0) and
    // the partition's row count (null, n) — so the corpus is scanned
    // exactly twice in total (sketch + exact recount), not three times
    // (a separate count() pass would be a full third scan at 100 TB).
    // The persisted intermediate is tiny: ≤ k+1 rows per partition.
    val sketch = vals.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var seen = 0L
      it.foreach { v =>
        seen += 1
        counters.get(v) match {
          case Some(c) => counters.update(v, c + 1)
          case None if counters.size < k => counters.update(v, 1L)
          case None =>
            // the Misra-Gries step: decrement every counter, evict zeros
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      counters.keysIterator.map(kk => (kk, 0L)) ++ Iterator((null: String, seen))
    }.toDF("v", "cnt").persist()
    val candidates = sketch.where(col("v").isNotNull).select("v").distinct()
    val total = sketch.where(col("v").isNull)
      .agg(coalesce(sum("cnt"), lit(0L)).cast("double").as("total"))
    vals.join(broadcast(candidates), "v")
      .groupBy("v")
      .agg(count(lit(1)).cast("long").as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") >= col("total") * minCountOfTotal)
      .select("v", "n")
  }
}
