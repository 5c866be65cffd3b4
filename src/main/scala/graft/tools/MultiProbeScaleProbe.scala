package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch
import graft.io.Tables

/** Measured recall/cost frontier for the LSH family (q49 single-probe,
  * q316 multi-probe) across plane counts — the tuning table a 100 TB
  * deployment reads before picking its index parameters.
  *
  * The scale truth this probe makes visible: with a FIXED plane count
  * p, hyperplane LSH scans a constant FRACTION of the corpus
  * (≈ 1/2^p per probed bucket), so candidate work still grows
  * linearly with N — scaling out means growing p (and recovering the
  * lost recall with multi-probe) or moving to the IVF/PQ family
  * (q64/q111). Output, per (nPlanes, strategy): mean candidates per
  * query, the candidate fraction of the corpus, and recall@10 vs the
  * brute oracle.
  *
  * Run: sbt "runMain graft.tools.MultiProbeScaleProbe [sfDir]"
  */
object MultiProbeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = Tables.load(spark, sfDir, "embeddings").cache()
      val n = e.count()
      val probes = e.filter(col("vec_id") < 50).cache()
      val nq = probes.count()
      val brute = SimilaritySearch.bruteTopK(probes, e, 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      brute.count()
      println(f"corpus=$n%d queries=$nq%d  (recall@10 vs brute)")
      println("planes  strategy     cand/query   frac(corpus)  recall@10")
      Seq(8, 10, 12).foreach { p =>
        Seq("single" -> 0, "multi3" -> 2).foreach { case (label, extra) =>
          val topk =
            if (extra == 0)
              SimilaritySearch.lshTopK(probes, e, 10, nPlanes = p)
            else
              SimilaritySearch.multiProbeTopK(probes, e, 10,
                nPlanes = p, probes = extra)
          // candidate count = bucket-join size before ranking; rebuild
          // the join to count it (the topk result is already truncated)
          val ps = SimilaritySearch.planes(p,
            SimilaritySearch.deriveDim(e, "embedding"))
          val c = e.select(col("vec_id").as("nid"),
            SimilaritySearch.bucket(col("embedding"), ps).as("bkt"))
          val qb = probes.select(col("vec_id").as("qid"),
            SimilaritySearch.bucket(col("embedding"), ps).as("bkt"))
          // EXACT candidate volume for both strategies: distinct
          // (query, neighbor) pairs through the probed bucket union —
          // the same candidate frame the topK ranks (an upper bound
          // like single×(1+probes) ignores bucket-union dedup and
          // misleads the parameter choice this tool exists to inform)
          val cand =
            if (extra == 0)
              qb.join(c, "bkt").where(col("qid") =!= col("nid")).count()
            else
              SimilaritySearch.multiProbeCandidates(probes, e,
                  nPlanes = p, probes = extra)
                .select("query_id", "neighbor_id").count()
          val hits = topk.select(col("query_id"), col("neighbor_id"))
            .join(brute, Seq("query_id", "neighbor_id")).count()
          val recall = hits.toDouble / (nq * 10.0)
          println(f"$p%6d  $label%-10s ${cand / nq}%10d   " +
            f"${cand.toDouble / (nq * n)}%10.4f  $recall%9.3f")
        }
      }
    } finally spark.stop()
  }
}
