package graft.tools

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Dev diagnostic (r9 verdict items 1-2): where does the time go in the
  * rewritten q365 (compound-key fuzzy pairs) and q392 (sampled blocking
  * audit) at sf0.1 — candidate generation, DL verify, or harness? Each
  * stage is timed over `runs` repeats (min reported) after a warmup.
  * Run: sbt "runMain graft.tools.FuzzyBlockProbe [sfDir]"
  */
object FuzzyBlockProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(appName = "fuzzy-block-probe")
    def bench(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${times.min}%.2fs  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))

    val toks = p
      .select(col("p_partkey").as("id"), col("p_brand"),
        length(col("p_name")).as("len"),
        posexplode(split(col("p_name"), " ")).as(Seq("i", "tok")))
      .select(col("id"), col("p_brand"), col("len"),
        concat_ws("#", (col("i") + 1).cast("string"), col("tok")).as("bkey"))
    val cand = toks.as("a").join(toks.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    bench("q365 candidates only")(cand)
    val joined = cand
      .join(p.select(col("p_partkey").as("id_a"), col("p_brand"),
        col("p_name").as("name_a")), "id_a")
      .join(p.select(col("p_partkey").as("id_b"),
        col("p_name").as("name_b")), "id_b")
    bench("q365 cand+name join, no DL")(joined)
    bench("q365 full (with DL)")(
      joined
        .withColumn("dl", graft.functions.DamerauLevenshtein(
          col("name_a"), col("name_b")))
        .where(col("dl") <= 3 && col("dl") > 0)
        .select(col("id_a"), col("id_b"), col("p_brand"),
          col("dl").cast("long").as("dl"))
        .orderBy("id_a", "id_b"))

    println("[probe] candidates=" + cand.count())
    spark.stop()
  }
}
