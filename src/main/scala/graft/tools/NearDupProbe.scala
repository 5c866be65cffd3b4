package graft.tools
import org.apache.spark.sql.functions._
import graft.ext.Dedup
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "neardup-probe")
    import spark.implicits._
    val vocab = Seq("the","fast","key","order","sort","table","scan","merge","part","window","small","hash","join","spark","group","query","row","data","slow","filter","customer","line","batch","value","agg","vector","column","stream","big","a","dup")
    val rnd = new scala.util.Random(13)
    val docs = (0 until 50000).map { i =>
      val len = 60 + rnd.nextInt(61)
      (i.toLong, Array.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val withDups = docs.map { case (i, t) => if (i % 50 == 49) (i, docs((i-1).toInt)._2 + " dup") else (i, t) }
    val df = spark.createDataset(withDups).toDF("doc_id", "text").repartition(32).cache()
    df.count()
    val t0 = System.nanoTime()
    val n = Dedup.nearDupPairs(df, "text", "doc_id", 0.5).count()
    println(f"NEARDUP_50K ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")

    // hash-order vs document-frequency-order prefix filtering (the
    // PPJoin trade documented at Dedup.prefixFilterCandidates): count
    // candidate pairs both ways on the sf0.1 documents fixture — adopt
    // freq order only if candidates drop >= 2x (it costs 2 extra
    // shuffles)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docsTbl = graft.io.Tables.load(spark, sfDir, "documents")
    val prepped = docsTbl
      .select(col("doc_id").as("id"),
        sort_array(Dedup.shingleHashes(col("text"))).as("hs"))
      .withColumn("n", size(col("hs")))
      .where(col("n") > 0)
      .cache()
    prepped.count()
    for (freqOrder <- Seq(false, true)) {
      val t1 = System.nanoTime()
      val c = Dedup.prefixFilterCandidates(prepped, 0.5, freqOrder).count()
      val label = if (freqOrder) "freq" else "hash"
      println(f"PREFIX_ORDER $label%-4s candidates=$c%6d ${(System.nanoTime()-t1)/1e9}%.2fs ($sfDir)")
    }
    spark.stop()
  }
}
