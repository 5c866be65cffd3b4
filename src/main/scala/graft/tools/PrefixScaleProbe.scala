package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev diagnostic: scaling curve for the sorted-neighborhood prefix-
  * containment shape (q168) on synthetic corpora (generated in /tmp-free
  * memory — never touches /root/testdata). The claims to back with
  * numbers (DESIGN.md round-7 notes):
  *   1. wall time grows ~n log n (the blocked sort), nowhere near the
  *      n² of a pairwise prefix join;
  *   2. 2-char blocking keeps the largest block a small corpus fraction
  *      (the window's skew exposure), and containment found by the
  *      blocked window equals a direct prefix check on a planted set.
  */
object PrefixScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "prefix-scale-probe")
    import spark.implicits._

    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima", "mike", "nov",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform")

    def corpus(n: Int): DataFrame = {
      // deterministic strings 40-80 tokens; every 20th doc is a planted
      // PREFIX of its predecessor (truncated-crawl shape)
      val rnd = new scala.util.Random(29)
      val docs = (0 until n).map { i =>
        val len = 40 + rnd.nextInt(41)
        val toks = Array.fill(len)(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, toks.mkString(" "))
      }
      val planted = docs.map { case (i, t) =>
        if (i % 20 == 19) {
          val prev = docs((i - 1).toInt)._2
          (i, prev.substring(0, prev.length / 2))
        } else (i, t)
      }
      spark.createDataset(planted).toDF("doc_id", "nt").repartition(32)
    }

    Seq(50000, 200000, 800000).foreach { n =>
      val df = corpus(n).cache(); df.count()
      val t0 = System.nanoTime()
      val w = Window.partitionBy(substring(col("nt"), 1, 2))
        .orderBy("nt", "doc_id")
      val found = df
        .withColumn("nxt", lead(col("nt"), 1).over(w))
        .where(col("nxt").isNotNull && col("nxt").startsWith(col("nt")))
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      val blocks = df.groupBy(substring(col("nt"), 1, 2)).count()
        .agg(max("count").as("mx"), count(lit(1)).as("nb")).collect().head
      println(f"n=$n%7d  ${s}%6.2fs  contained=$found%6d  " +
        f"blocks=${blocks.getLong(1)}%4d  largest=${blocks.getLong(0)}%7d " +
        f"(${blocks.getLong(0) * 100.0 / n}%.1f%% of corpus)")
      df.unpersist()
    }
    spark.stop()
  }
}
