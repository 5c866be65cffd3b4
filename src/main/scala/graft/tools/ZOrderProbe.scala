package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.io.Tables

/** Measures the layout claim behind q101: range-partitioning by the
  * Z-order key gives BOTH interleaved dimensions min/max pruning power,
  * while a plain sort favors only its leading column.
  *
  * Method: lay lineitem out 32 range-partitions three ways — by
  * l_partkey (linear), by l_suppkey (linear), by the Morton interleave —
  * record each partition's (min, max) for both key columns (what parquet
  * row-group / file-footer stats would hold), then for a sample of
  * point-filter values count how many partitions' ranges contain the
  * value (= must be read). Reported as the mean fraction of partitions a
  * point filter touches; 1.0 means "no pruning, full scan".
  *
  * Usage: sbt "runMain graft.tools.ZOrderProbe [sfDir]"
  */
object ZOrderProbe {

  private def touchedFraction(spark: SparkSession, laid: DataFrame,
                              probeCol: String, values: Seq[Long]): Double = {
    val stats = laid
      .groupBy(spark_partition_id().as("pid"))
      .agg(min(probeCol).as("lo"), max(probeCol).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val nParts = stats.length.toDouble
    values.map(v => stats.count { case (lo, hi) => lo <= v && v <= hi } / nParts)
      .sum / values.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Engine.session(appName = "graft-zorder-probe")
    spark.sparkContext.setLogLevel("WARN")

    // stretch both dims into the full 16-bit domain first — WITHOUT it,
    // a narrow dimension (suppkey has 1k distinct values at sf0.1)
    // contributes only low-order bits and the Morton order degenerates
    // to a plain sort on the wide column (measured: y_filter_touches
    // went 0.93 un-stretched → ~0.2 stretched). See ZOrder.stretch16.
    val raw = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val Array(maxX, maxY) = raw.agg(max("x"), max("y")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val l = raw
      .withColumn("z", ZOrder.interleave16(
        ZOrder.stretch16(col("x"), maxX), ZOrder.stretch16(col("y"), maxY)))
      .cache()

    // deterministic probe values: every 37th distinct key, 100 of each
    def probes(c: String): Seq[Long] =
      l.select(c).distinct().orderBy(c).collect().map(_.getLong(0))
        .grouped(37).map(_.head).take(100).toSeq

    val px = probes("x")
    val py = probes("y")
    val layouts = Seq(
      "linear_by_x" -> l.repartitionByRange(32, col("x")),
      "linear_by_y" -> l.repartitionByRange(32, col("y")),
      "zorder" -> l.repartitionByRange(32, col("z")))
    for ((name, laid) <- layouts) {
      val cached = laid.cache()
      val fx = touchedFraction(spark, cached, "x", px)
      val fy = touchedFraction(spark, cached, "y", py)
      println(f"ZORDER_PROBE layout=$name%-12s x_filter_touches=$fx%.3f y_filter_touches=$fy%.3f")
      cached.unpersist()
    }
    spark.stop()
  }
}
