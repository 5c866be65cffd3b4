package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global ranking — the scalable replacement for the
  * single-partition window (`Window.orderBy(...)` with no partition key
  * moves the WHOLE dataset through one task; rank/ntile/percent_rank over
  * a large table is the canonical way to accidentally serialize a job).
  *
  * Same two-pass shape as [[Packing.packBins]] / `graft.io.TextRecords`:
  * range-repartition on the sort key (a narrow exchange whose partition
  * count scales with data volume), sort within partitions, pass 1 sends
  * ONE row-count per partition to the driver (O(#partitions)), pass 2
  * streams every partition with its broadcast base offset. The rank a row
  * receives is its position in the unique total order, so the result is
  * independent of where the range boundaries fall — partition-count
  * invariance is pinned in Extension4Spec.
  *
  * The sort columns MUST form a total order (include a unique tiebreaker
  * like the row id): with duplicate full keys the rank of the duplicates
  * would depend on physical placement.
  */
object Ranking {

  /** Appends `global_rank` (1-based, in `sortCols` order) and returns the
    * total row count alongside (it falls out of pass 1 for free — no
    * separate `count()` scan).
    *
    * Both passes map over the SAME RDD object, so the range exchange's
    * map stage runs once and pass 2 re-reads its shuffle files (Spark
    * skips completed stages for a shared lineage); only the in-partition
    * sort re-executes — the same cost model as [[Packing.packBins]].
    */
  def withGlobalRankAndCount(df: DataFrame, sortCols: Seq[Column],
                             partitions: Int = 32): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "sortCols must not be empty")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    val partCounts = rdd
      .mapPartitionsWithIndex { (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val bases = partCounts.scanLeft(0L)(_ + _)
    val basesB = spark.sparkContext.broadcast(bases)
    val withRank = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = basesB.value(pid)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    val schema = sorted.schema.add(StructField("global_rank", LongType, nullable = false))
    (spark.createDataFrame(withRank, schema), partCounts.sum)
  }

  /** [[withGlobalRankAndCount]] without the count. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     partitions: Int = 32): DataFrame =
    withGlobalRankAndCount(df, sortCols, partitions)._1

  /** Global rank AND inclusive running total of a LONG column in the
    * `sortCols` order — the distributed twin of
    * `sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`, built from
    * the same two passes (pass 1 ships one (count, sum) pair per
    * partition to the driver, pass 2 streams with broadcast bases).
    * The value column is deliberately LONG-only: integer prefix sums are
    * associative, so the partition-wise accumulation is EXACTLY the
    * sequential fold an oracle's window computes — doubles would drift
    * at the regrouping boundaries (Packing's rule; callers sum cents,
    * tokens, counts — never raw doubles).
    *
    * @return (df + global_rank + running_total columns, (rowCount, grandTotal))
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                       partitions: Int = 32): (DataFrame, (Long, Long)) = {
    require(sortCols.nonEmpty, "sortCols must not be empty")
    val vField = df.schema(valueCol) // throws with the column name if absent
    require(vField.dataType == LongType,
      s"withRunningTotal is LONG-only (integer prefix sums are exact; " +
        s"sum cents/tokens/counts, never raw doubles) — '$valueCol' is " +
        s"${vField.dataType.simpleString}")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partStats = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; var s = 0L
        it.foreach { r => n += 1; s += r.getLong(vIdx) }
        Iterator((pid, n, s))
      }
      .collect().sortBy(_._1)
    val rankBases = partStats.map(_._2).scanLeft(0L)(_ + _)
    val sumBases = partStats.map(_._3).scanLeft(0L)(_ + _)
    val basesB = spark.sparkContext.broadcast((rankBases, sumBases))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = basesB.value._1(pid)
      var s = basesB.value._2(pid)
      it.map { row =>
        r += 1; s += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ r :+ s)
      }
    }
    val schema = sorted.schema
      .add(StructField("global_rank", LongType, nullable = false))
      .add(StructField("running_total", LongType, nullable = false))
    (spark.createDataFrame(out, schema),
      (partStats.map(_._2).sum, partStats.map(_._3).sum))
  }

  /** SQL `ntile(buckets)` as a closed form over a 1-based unique rank:
    * the first `n mod buckets` tiles hold `n div buckets + 1` rows, the
    * rest `n div buckets`. Expressed as exact integer arithmetic so both
    * engines (and the [[withGlobalRank]] path, which never materializes a
    * window) compute identical tile ids; equivalence with Spark's own
    * `ntile` window function is pinned in Extension4Spec.
    */
  def ntileFromRank(rankCol: Column, n: Long, buckets: Int): Column = {
    import org.apache.spark.sql.functions._
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // exact integer division via pmod (Column./ is DOUBLE division — the
    // Packing rule: never trust it past 2^53): x - pmod(x, d) is an exact
    // multiple of d, so the double quotient is exact
    def idiv(x: Column, d: Long): Column =
      ((x - pmod(x, lit(d))) / lit(d)).cast("long")
    val q = n / buckets
    val rm = n % buckets
    if (q == 0) rankCol // fewer rows than buckets: tile == rank
    else when(rankCol <= rm * (q + 1), idiv(rankCol - 1, q + 1) + 1)
      .otherwise(lit(rm) + idiv(rankCol - rm * (q + 1) - 1, q) + 1)
  }
}
