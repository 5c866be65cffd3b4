package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the q249/q264 claim: a running max/sum over a GLOBAL order
  * via one unpartitioned window moves every row to one task, while the
  * two-pass block discipline (per-block window + bounded block-frame
  * prefix + broadcast join) keeps the data-sized work partitioned.
  *
  * The fixture events replicate COPY_FACTOR times (ids re-spaced to
  * keep the order total) so the probe runs at ~N× sf0.1. Both plans
  * compute the identical per-row running max (asserted on a checksum),
  * so the delta is purely the execution shape.
  *
  * Usage: sbt "runMain graft.tools.PrefixScanProbe [sfDir] [copies]"
  */
object PrefixScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.io.Tables.load(spark, sfDir, "events")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val n = base.count()
    val e = base
      .crossJoin(spark.range(copies).select(col("id").as("cp")))
      .select((col("event_id") * copies + col("cp")).as("oid"),
        (col("ts_us") + col("cp") * 7L).as("ts_us"))
      .repartition(16)
      .localCheckpoint()
    println(s"rows = ${e.count()} (sf fixture x$copies)")

    def checksum(df: DataFrame): Long =
      df.agg(sum(col("runmax") % 1000003L)).head().getLong(0)

    def timed(label: String)(mk: => DataFrame): Long = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val cs = checksum(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, cs)
      }
      println(f"$label%-16s min ${runs.map(_._1).min}%.2fs  " +
        f"(runs ${runs.map(r => f"${r._1}%.2f").mkString("/")})")
      runs.head._2
    }

    val csSingle = timed("single-window") {
      val w = Window.orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("runmax", max("ts_us").over(w))
    }
    val csTwoPass = timed("two-pass-block") {
      val blocked = e.withColumn("blk", expr("oid div 65536"))
      val wIn = Window.partitionBy("blk").orderBy("oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prev = blocked.groupBy("blk").agg(max("ts_us").as("bmax"))
        .withColumn("pmax", max("bmax").over(wPrev))
        .select(col("blk"), col("pmax"))
      blocked
        .withColumn("rin", max("ts_us").over(wIn))
        .join(broadcast(prev), Seq("blk"))
        .withColumn("runmax",
          greatest(col("rin"), coalesce(col("pmax"), lit(Long.MinValue))))
    }
    require(csSingle == csTwoPass,
      s"checksum mismatch: $csSingle vs $csTwoPass")
    println(s"checksums agree ($csSingle) over ${n * copies} rows")
    spark.stop()
  }
}
