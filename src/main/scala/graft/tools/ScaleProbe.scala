package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dev diagnostic: scaling curves for the near-dup operators on synthetic
  * corpora (generated in /tmp — never touches /root/testdata). The point:
  * LSH candidates and prefix-filtered Jaccard must grow ~linearly in doc
  * count (sub-quadratic), which is the empirical backing for DESIGN.md's
  * shuffle-budget table.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "scale-probe")
    import spark.implicits._

    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "spark", "group",
      "query", "row", "data", "slow", "filter", "customer", "line", "batch",
      "value", "agg", "vector", "column", "stream", "big", "a", "dup")

    def corpus(n: Int): DataFrame = {
      // deterministic synthetic docs: 60-120 tokens from the fixture
      // vocabulary; every 50th doc is a near-dup of its predecessor
      val rnd = new scala.util.Random(13)
      val docs = (0 until n).map { i =>
        val len = 60 + rnd.nextInt(61)
        val toks = Array.fill(len)(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, toks.mkString(" "))
      }
      val withDups = docs.map { case (i, t) =>
        if (i % 50 == 49) (i, docs((i - 1).toInt)._2 + " dup") else (i, t)
      }
      spark.createDataset(withDups).toDF("doc_id", "text").repartition(32)
    }

    def time(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-36s ${s}%7.2fs  rows=$rows")
      s
    }

    Seq(5000, 20000, 50000).foreach { n =>
      val df = corpus(n).cache()
      df.count() // materialize outside the timings
      println(s"--- n=$n docs ---")
      time(s"minhash_candidates n=$n")(
        Dedup.minhashCandidates(df, "text", "doc_id").count())
      time(s"jaccard_pairs(0.5) n=$n")(
        Dedup.jaccardPairs(df, "text", "doc_id", 0.5).count())
      time(s"simhash n=$n")(Dedup.simhash16(df, "text", "doc_id").count())
      df.unpersist()
      ()
    }
    spark.stop()
  }
}
