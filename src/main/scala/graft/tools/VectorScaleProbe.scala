package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch

/** Dev diagnostic: ANN scaling — brute-force (codegen cosine, broadcast
  * queries) vs hyperplane-LSH buckets at 100k/500k synthetic vectors.
  */
object VectorScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "vector-scale-probe")

    def corpus(n: Int): DataFrame =
      spark.range(n).toDF("vec_id")
        // deterministic pseudo-random 64-dim float vectors (sin-hash)
        .withColumn("embedding",
          expr("transform(sequence(1, 64), x -> cast(sin(vec_id * 997 + x * 131) as float))"))

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
    }

    Seq(100000, 500000).foreach { n =>
      val c = corpus(n).cache()
      c.count()
      val q = c.filter(col("vec_id") < 10)
      println(s"--- n=$n vectors ---")
      time(s"brute_top10 n=$n")(SimilaritySearch.bruteTopK(q, c, 10).count())
      time(s"lsh_top10 n=$n")(SimilaritySearch.lshTopK(q, c, 10).count())
      c.unpersist()
      ()
    }
    spark.stop()
  }
}
