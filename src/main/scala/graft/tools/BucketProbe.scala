package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.SimilaritySearch

/** Dev diagnostic: where does embeddingNearDup's time go — bucket
  * computation, the self-join, or the verify?
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "bucket-probe")
    val n = 100000
    val c = spark.range(n).toDF("vec_id")
      .withColumn("embedding",
        expr("transform(sequence(1, 64), " +
          s"x -> cast((xxhash64(vec_id % ${n / 2}, x) % 1000) / 1000.0 as float))"))
      .cache()
    c.count()

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
    }

    // baseline: scan + one codegen'd dot against a literal plane
    val p0 = SimilaritySearch.planes(1, 64).head
    val pl = array(p0.map(v => lit(v.toFloat)): _*)
    time("scan_only")(c.count())
    time("one_dot")(c.select(graft.functions.VectorFunctions
      .dotProduct(col("embedding"), pl).as("d")).filter(col("d") > 1e9).count())
    // one 16-plane bucket
    time("bucket_16planes_x1")(c.select(
      SimilaritySearch.bucket(col("embedding"), SimilaritySearch.planes(16, 64)).as("b"))
      .filter(col("b") > Long.MaxValue - 1).count())
    // 4 tables of 16 planes, exploded — the shape embeddingNearDup uses
    val tabs = (0 until 4).map { t =>
      struct(lit(t).as("t"),
        SimilaritySearch.bucket(col("embedding"),
          SimilaritySearch.planes(16, 64, seed = 7 + t)).as("bkt"))
    }
    time("bucket_16planes_x4_explode")(c.select(col("vec_id"),
      explode(array(tabs: _*)).as("tb")).filter(col("tb.bkt") > Long.MaxValue - 1).count())
    spark.stop()
  }
}
