package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, TextAnalysis}

/** Dev diagnostic: scaling of the round-4 curation operators on
  * synthetic corpora (same vocabulary trick as NearDupProbe) — each op
  * should be ~linear in docs, since none is pairwise:
  *  - decontamination: one scan+explode per side + a broadcast join
  *    against the (distinct, small) eval shingles;
  *  - repetition stats: two keyed aggregations;
  *  - chunking: projection + explode;
  *  - token-budget select: two narrow passes + one range shuffle;
  *  - PII redaction: three regexp_replace projections.
  *
  * Usage: sbt "runMain graft.tools.CurationScaleProbe [nDocs ...]"
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(50000, 200000)
    val spark = graft.Engine.session(appName = "curation-scale-probe")
    import spark.implicits._
    val vocab = Seq("the","fast","key","order","sort","table","scan","merge",
      "part","window","small","hash","join","spark","group","query","row",
      "data","slow","filter","customer","line","batch","value","agg","vector",
      "column","stream","big","a","dup")

    sizes.foreach { n =>
      val rnd = new scala.util.Random(17)
      val docs = (0 until n).map { i =>
        val len = 60 + rnd.nextInt(61)
        (i.toLong, Array.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataset(docs).toDF("doc_id", "text")
        .repartition(32).cache()
      df.count()

      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(f"CURATION_SCALE n=$n%7d $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$rows")
      }

      val b = Sampling.bucket(col("doc_id"), "probe")
      time("decontaminate")(
        Dedup.contaminationReport(df.where(b >= 2000), df.where(b < 2000),
          "text", "doc_id", n = 8).count())
      time("repetition")(
        TextAnalysis.repetitionStats(df, "text", "doc_id").count())
      time("chunking")(
        TextAnalysis.chunkTokens(df, "text", "doc_id", 50, 25).count())
      time("token_budget")(
        Sampling.tokenBudgetSelect(
          df.select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("q"),
            org.apache.spark.sql.functions.size(TextAnalysis.wsTokens(col("text")))
              .cast("long").as("t")),
          "doc_id", "q", "t", budget = n.toLong * 20).count())
      time("pii_redaction")(
        df.select(TextAnalysis.redactPii(col("text")).as("c"))
          .where(length(col("c")) > 0).count())
      df.unpersist()
    }
    spark.stop()
  }
}
