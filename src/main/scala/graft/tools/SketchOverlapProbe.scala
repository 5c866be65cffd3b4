package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev diagnostic: the q225 scaling claim — a P-source overlap matrix
  * via HLL set algebra costs one corpus scan plus P²/2 register merges
  * of KB sketches, while the exact q150 word self-join shuffles the
  * (source, word) postings into a pair space that grows with P² ×
  * shared-vocab. As P grows (vocab per source held constant), the
  * sketch path's cost is dominated by the single scan and stays
  * near-flat; the exact join's pair aggregation grows quadratically.
  *
  * The probe generates P sources sharing a common vocabulary core
  * (every pair overlaps — the hostile case for the exact join), times
  * both paths at increasing P, and prints the ratio. Usage:
  *   sbt "runMain graft.tools.SketchOverlapProbe [maxP]"
  */
object SketchOverlapProbe {
  def main(args: Array[String]): Unit = {
    val maxP = args.headOption.map(_.toInt).getOrElse(160)
    val spark = graft.Engine.session(appName = "sketch-overlap-probe")

    // per source: 2000 shared-core words + 2000 private words
    def sourceWords(p: Int): DataFrame =
      spark.range(p.toLong).select(col("id").as("src"))
        .select(col("src"), explode(sequence(lit(0), lit(3999))).as("i"))
        .select(concat(lit("s"), col("src")).as("source"),
          when(col("i") < 2000, concat(lit("core"), col("i")))
            .otherwise(concat(lit("w"), col("src") * 100000 + col("i")))
            .as("word"))

    def exactPairs(sw: DataFrame): Long =
      sw.select(col("source").as("sa"), col("word"))
        .join(sw.select(col("source").as("sb"), col("word")), "word")
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("common"))
        .count()

    def sketchPairs(sw: DataFrame): Long = {
      val sk = sw.groupBy("source")
        .agg(hll_sketch_agg(col("word")).as("sk"))
      sk.select(col("source").as("sa"), col("sk").as("ska"))
        .join(sk.select(col("source").as("sb"), col("sk").as("skb")),
          col("sa") < col("sb"))
        .select(hll_sketch_estimate(
          hll_union(col("ska"), col("skb"))).as("eu"))
        .count()
    }

    println("P,pairs,exact_sec,sketch_sec,ratio")
    Seq(20, 40, 80, maxP).foreach { p =>
      val sw = sourceWords(p).localCheckpoint()
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (pairs, te) = time(exactPairs(sw))
      val (_, ts) = time(sketchPairs(sw))
      println(f"$p,$pairs,$te%.2f,$ts%.2f,${te / ts}%.1f")
    }
    spark.stop()
  }
}
