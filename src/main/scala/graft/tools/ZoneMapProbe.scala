package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.{Sources, Tables}

/** Measures zone-map file skipping at sf0.1: for the q463 band and the
  * q470 box, the fraction of files (and of rows, via the manifest's
  * n_rows) a pruned read touches, across file counts. The row fraction
  * is the scan-cost proxy — at 100 TB it is the fraction of the table
  * that leaves the object store.
  *
  *   sbt "runMain graft.tools.ZoneMapProbe"
  *
  * Measured 2026-08-15 (events sf0.1, 100k rows):
  *   1-D value band [30,40):   16 files ->  2 selected, rows 12.7%
  *                             64 files ->  7 selected, rows 11.1%
  *                            256 files -> 26 selected, rows 10.1%
  *   2-D box val[20,60)×3d:    16 files ->  6 selected, rows 37.8%
  *                             64 files -> 11 selected, rows 17.4%
  *                            256 files -> 21 selected, rows  8.3%
  *   box true-row selectivity: 3.69% — the z-order read fraction
  *   CONVERGES toward it as files shrink (37.8% → 17.4% → 8.3%),
  *   because each finer file is a tighter (x, y) box; the 1-D band
  *   plateaus at its own band mass (~10%) from the start because the
  *   clustering column IS the predicate column. At a 100 TB table the
  *   file count is 10⁵–10⁶, far past the fine end of this sweep.
  */
object ZoneMapProbe {
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
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("value"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("hour"))
    val totalRows = ev.count().toDouble

    def rowsOf(path: String, files: Seq[String]): Long = {
      val m = spark.read.parquet(s"$path/_zonemap")
      if (files.isEmpty) 0L
      else m.where(col("file").isin(files: _*))
        .agg(sum("n_rows")).head().getLong(0)
    }

    for (n <- Seq(16, 64, 256)) {
      val p1 = s"${System.getProperty("java.io.tmpdir")}/graft_zmprobe1_$n"
      Sources.writeWithZoneMap(ev, p1, "value", n)
      val (sel1, tot1) = Sources.zoneMapFiles(spark, p1, 30.0, 40.0)
      val r1 = rowsOf(p1, sel1)
      println(f"1D band  n=$n%3d: files ${sel1.length}%3d/$tot1%3d " +
        f"(${100.0 * sel1.length / tot1}%5.1f%%)  rows $r1%6d " +
        f"(${100.0 * r1 / totalRows}%5.1f%%)")

      val p2 = s"${System.getProperty("java.io.tmpdir")}/graft_zmprobe2_$n"
      Sources.writeWithZoneMap2(ev, p2, "value", "hour", n)
      val (sel2, tot2) = Sources.zoneMapFiles2(spark, p2,
        20.0, 60.0, 473400.0, 473472.0)
      val r2 = spark.read.parquet(s"$p2/_zonemap")
        .where(col("file").isin(sel2: _*))
        .agg(sum("n_rows")).head().getLong(0)
      println(f"2D box   n=$n%3d: files ${sel2.length}%3d/$tot2%3d " +
        f"(${100.0 * sel2.length / tot2}%5.1f%%)  rows $r2%6d " +
        f"(${100.0 * r2 / totalRows}%5.1f%%)")
    }
    val trueSel = ev.where(col("value") >= 20.0 && col("value") < 60.0 &&
      col("hour") >= 473400L && col("hour") < 473472L).count()
    println(f"box true selectivity: $trueSel rows " +
      f"(${100.0 * trueSel / totalRows}%5.2f%%)")
    spark.stop()
  }
}
