package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** A/B probe for the two winnowing formulations (r8): the original
  * posexplode → hash-partition-by-doc → window-min shape vs the
  * one-pass compiled expression (`functions.WinnowedFingerprints`).
  * Both run to a count (same downstream), min-of-3 after a warmup pass.
  *
  * Usage: sbt "runMain graft.tools.WinnowProbe [sfDir]"
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "graft-winnow-probe")
    val docs = Tables.load(spark, sfDir, "documents")

    val C = 1L << 20
    def windowForm = {
      val grams = docs
        .select(col("doc_id"),
          posexplode(graft.functions.WordNgrams(col("text"), 5,
            distinct = false)))
        .select(col("doc_id"), col("pos"),
          (graft.functions.PolyHash(col("col")) * C +
            (lit(C - 1) - col("pos"))).as("key"))
      val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
      val whole = Window.partitionBy("doc_id")
      grams
        .withColumn("n", count(lit(1)).over(whole))
        .withColumn("sel", min("key").over(win))
        .where(col("pos") <= col("n") - 4)
        .selectExpr("doc_id", s"sel div $C AS h",
          s"${C - 1} - (sel % $C) AS fp_pos")
        .distinct()
    }
    def exprForm = graft.ext.Dedup.winnowedFingerprints(
      docs, "text", "doc_id")

    def time(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var n = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        n = mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, n)
    }
    // warmup both shapes
    windowForm.count(); exprForm.count()
    val (tw, nw) = time(windowForm)
    val (te, ne) = time(exprForm)
    println(f"WINNOW_PROBE window=$tw%.3fs expr=$te%.3fs rows($nw/$ne) " +
      f"speedup=${tw / te}%.2fx")
    require(nw == ne, s"formulations disagree: $nw vs $ne")
    spark.stop()
  }
}
