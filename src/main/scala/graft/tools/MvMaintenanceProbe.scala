package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.MaterializedView

/** Measures incremental MV maintenance vs full recompute at sf0.1:
  * the per-user rollup is created once, then delta batches of growing
  * size merge in; each merge is timed against a from-scratch groupBy
  * over the whole fact table. The point to demonstrate: merge cost
  * tracks |MV| + |delta| (flat as the fact table grows), recompute
  * cost tracks the fact table.
  *
  *   sbt "runMain graft.tools.MvMaintenanceProbe"
  *
  * Measured 2026-08-15 (events sf0.1, 100k fact rows, 1.5k-group MV):
  *   delta   100 rows: merge 0.66s   full recompute 0.19s
  *   delta  1000 rows: merge 0.58s   full recompute 0.19s
  *   delta 10000 rows: merge 0.50s   full recompute 0.14s
  * Honest reading: the merge is FLAT in delta size (its ~0.5s is the
  * fixed MV-read + version-write floor), while the recompute is linear
  * in the fact table — which at 100k rows still sits BELOW the merge's
  * floor. The crossover is the fact-table scale-up the MV exists for:
  * at 1000× the facts (the 100 TB shape) the recompute pays 1000× scan
  * where the merge's inputs (group-sized MV + the delta) are unchanged,
  * so the floor stays ~constant. The probe's claim is the flatness,
  * not a toy-scale win.
  */
object MvMaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_mvprobe"
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    MaterializedView.create(ev.where(col("event_id") % 2 === 0),
      Seq("user_id"), "cents", path)
    // warm both paths once
    MaterializedView.applyDelta(spark, path,
      ev.where(col("event_id") % 1000 === 1).withColumn("op", lit(1L)),
      Seq("user_id"), "cents", "op")
    ev.groupBy("user_id").agg(count(lit(1)), sum("cents"))
      .write.format("noop").mode("overwrite").save()

    for (denom <- Seq(1000, 100, 10)) {
      val delta = ev.where(col("event_id") % 2 =!= 0 &&
          pmod(col("event_id"), lit(denom)) === 3)
        .withColumn("op", lit(1L))
      val dn = delta.count()
      val (_, tMerge) = time {
        MaterializedView.applyDelta(spark, path, delta,
          Seq("user_id"), "cents", "op")
      }
      val (_, tFull) = time {
        ev.groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("mv_n"),
            sum("cents").cast("long").as("mv_sum"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"delta $dn%7d rows: merge $tMerge%6.2fs  " +
        f"full-recompute(no write) $tFull%6.2fs")
    }
    spark.stop()
  }
}
