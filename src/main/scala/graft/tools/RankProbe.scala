package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Ranking

/** Dev diagnostic: distributed global rank (ext.Ranking two-pass prefix
  * count) vs the single-partition `row_number().over(Window.orderBy(...))`
  * — the shape Spark itself warns about ("No Partition Defined for Window
  * operation! Moving all data to a single partition"). The window path
  * funnels every row through ONE task's sort; the Ranking path is a range
  * exchange plus two narrow passes, so it keeps all cores busy and its
  * advantage grows with both data volume and core count.
  *
  * Also times PQ vs brute ANN at the same corpus sizes as
  * VectorScaleProbe: the ADC scan reads 8 codes/candidate instead of a
  * 64-float dot, so per-candidate cost — which at 100 TB is the index
  * scan cost — drops even when local wall-clock is dominated by the
  * (unavoidable, one-off) encode pass.
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "rank-probe")

    def time(label: String)(body: => Long): Double = {
      body // untimed warmup: pay codegen/JIT before the measured run
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-36s $dt%7.2fs  rows=$rows")
      dt
    }

    Seq(1000000, 5000000).foreach { n =>
      // unique synthetic sort key (value, id): forces a real sort, no
      // pathological duplicate runs
      val df = spark.range(n).toDF("id")
        .withColumn("v", expr("cast(sin(id * 1009) * 1e6 as long)"))
        .cache()
      df.count()
      println(s"--- n=$n rows ---")
      time(s"ranking_two_pass n=$n") {
        Ranking.withGlobalRank(df, Seq(col("v"), col("id")))
          .agg(max("global_rank")).head().getLong(0)
      }
      time(s"single_partition_window n=$n") {
        df.withColumn("r", row_number().over(Window.orderBy(col("v"), col("id"))))
          .agg(max("r")).head().getInt(0).toLong
      }
      df.unpersist()
      ()
    }

    def corpus(n: Int) =
      spark.range(n).toDF("vec_id")
        .withColumn("embedding",
          expr("transform(sequence(1, 64), x -> cast(sin(vec_id * 997 + x * 131) as float))"))

    // production shape: the PQ index (codes table) is built ONCE and
    // persisted; query time is the ADC scan over codes vs the brute
    // float scan over raw vectors — both sides cached so the comparison
    // is compute, not IO (at 100 TB the codes side also reads 32x fewer
    // bytes, which this local probe can't show)
    Seq(100000, 500000).foreach { n =>
      val c = corpus(n).cache()
      c.count()
      val q = c.filter(col("vec_id") < 10)
      println(s"--- n=$n vectors ---")
      time(s"brute_top10 n=$n")(
        graft.ext.SimilaritySearch.bruteTopK(q, c, 10).count())
      val cb = graft.ext.SimilaritySearch.pqCodebook(c, "vec_id", "embedding", 8, 16)
      val codes = graft.ext.SimilaritySearch.pqEncodeCorpus(c, cb).cache()
      time(s"pq_encode_once n=$n")(codes.count())
      time(s"pq_adc_scan n=$n")(
        graft.ext.SimilaritySearch.pqScoreTopK(q, codes, cb, 10).count())
      time(s"ivfpq_end_to_end n=$n")(
        graft.ext.SimilaritySearch.ivfPqTopK(q, c, 10,
          nCentroids = 64, nProbe = 4).count())
      codes.unpersist()
      c.unpersist()
      ()
    }

    spark.stop()
  }
}
