package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.io.Tables

/** Dev diagnostic: time the stages of the near-dup pipeline separately. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "graft-profile")
    val docs = Tables.load(spark, sfDir, "documents")

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    time("warmup count")(docs.count())
    time("shingle strings")(docs.select(explode(Dedup.shingles(col("text")))).count())
    time("shingle hashes")(docs.select(explode(Dedup.shingleHashes(col("text")))).count())
    time("minhash signatures")(Dedup.minhashSignatures(docs, "text", "doc_id").count())
    time("minhash candidates")(Dedup.minhashCandidates(docs, "text", "doc_id").count())
    time("jaccard pairs")(Dedup.jaccardPairs(docs, "text", "doc_id", 0.5).count())
    spark.stop()
  }
}
