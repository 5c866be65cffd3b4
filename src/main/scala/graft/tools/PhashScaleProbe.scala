package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev diagnostic: the q291 scaling claim — hamming-LSH banding turns
  * perceptual-hash near-dup detection into four 16-bit-key equi-joins
  * whose cost tracks the number of COLLIDING pairs, while the brute
  * path scores all N²/2 pairs regardless of how few are near. The
  * probe plants one near-dup partner (hamming ≤ 3, guaranteed one
  * clean band) for every 100th hash in a corpus of spread 64-bit
  * hashes, times both paths at increasing N, and checks they return
  * the same pair count. Usage:
  *   sbt "runMain graft.tools.PhashScaleProbe [maxN]"
  */
object PhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toInt).getOrElse(160000)
    val spark = graft.Engine.session(appName = "phash-scale-probe")

    // spread base hashes via two PolyHash halves (the q291 stub spread);
    // every 100th id gets a partner = base with bits 0 and 17 flipped
    // (hamming 2 -> bands 2 and 3 stay clean)
    def hashes(n: Int): DataFrame = {
      val base = spark.range(n.toLong).select(col("id"))
        .withColumn("c", graft.functions.PolyHash(
          concat(lit("ph#"), col("id").cast("string"))))
        .withColumn("h",
          expr(s"shiftleft(c, 32) ^ ((c * c) % ${graft.functions.PolyHash.Mod})"))
        .select(col("id"), col("h"))
      val partners = base.where(col("id") % 100 === 0)
        .select((col("id") + lit(1000000000L)).as("id"),
          expr("h ^ 131073").as("h")) // bits 0 and 17
      base.union(partners)
    }

    def brutePairs(df: DataFrame): Long =
      df.select(col("id").as("ia"), col("h").as("ha"))
        .join(df.select(col("id").as("ib"), col("h").as("hb")),
          col("ia") < col("ib"))
        .where(expr("bit_count(ha ^ hb) <= 3"))
        .count()

    def bandedPairs(df: DataFrame): Long = {
      val bands = df
        .withColumn("band", explode(array(lit(0), lit(1), lit(2), lit(3))))
        .withColumn("bkey", expr("shiftright(h, band * 16) & 65535"))
      bands.select(col("id").as("ia"), col("h").as("ha"),
          col("band"), col("bkey"))
        .join(bands.select(col("id").as("ib"), col("h").as("hb"),
          col("band"), col("bkey")), Seq("band", "bkey"))
        .where(col("ia") < col("ib"))
        .select("ia", "ib", "ha", "hb").distinct()
        .where(expr("bit_count(ha ^ hb) <= 3"))
        .count()
    }

    println("N,pairs_brute,pairs_banded,brute_sec,banded_sec,ratio")
    Seq(10000, 20000, 40000, maxN).foreach { n =>
      val df = hashes(n).localCheckpoint()
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // brute is O(N²) — only run it where it stays tractable
      val (pb, tb) =
        if (n <= 320000) time(brutePairs(df)) else (-1L, Double.NaN)
      val (pl, tl) = time(bandedPairs(df))
      if (pb >= 0) require(pb == pl, s"pair mismatch: brute $pb vs banded $pl")
      println(f"$n,$pb,$pl,$tb%.2f,$tl%.2f,${tb / tl}%.1f")
    }
    spark.stop()
  }
}
