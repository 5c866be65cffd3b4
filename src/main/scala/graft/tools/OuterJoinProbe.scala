package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Dev diagnostic DEMONSTRATING the filter-pushdown/watermark trap that
  * bit q82's first version: this pipeline keeps the `user_id >= 0`
  * sentinel filter INSIDE the streaming plan, above the left-outer
  * join. Catalyst legally pushes it below the join on the left side —
  * below the watermark node — and infers `p_user >= 0` for the right
  * side from the equi-join condition, so BOTH sentinel sources read 0
  * rows, the watermark stalls at (last real event − 2h), and the final
  * click's null row never emits: TOTAL prints 209, not 210, under both
  * triggers. The shipped q82 filters batch-side on the sink table
  * instead. Kept as the reproducer; `SentinelProbe` is the positive
  * control (sentinels flow when no join is involved).
  */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session(appName = "outer-join-probe")
    import spark.implicits._

    def mkSentinel(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
      val d = Files.createTempDirectory("ojp_sentinel")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(d.toString)
      d.toString
    }
    val clickSentinel = mkSentinel(Seq((-1L, 4102444800000000000L, -1L, "click", 0.0, "{}")))
    val purchSentinel = mkSentinel(Seq((-2L, 4102444800000000000L, -2L, "purchase", 0.0, "{}")))

    def run(label: String, availableNow: Boolean): Unit = {
      val ckpt = Files.createTempDirectory(s"ojp_ckpt_$label")
      def side(t: String) = {
        val sentinel = if (t == "click") clickSentinel else purchSentinel
        EventStreams
          .readStream(spark, dir, globFilter = Some("events.parquet"))
          .unionByName(EventStreams.readStream(spark, sentinel,
            globFilter = Some("*.parquet")))
          .where(col("event_type") === t)
      }
      val clicks = side("click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val purchases = side("purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val w = clicks.join(purchases,
          col("user_id") === col("p_user")
            && col("p_ts") >= col("c_ts")
            && col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
          "left_outer")
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("click_id"), col("purchase_id"))
        .writeStream
        .format("memory")
        .queryName(s"ojp_$label")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
      val q =
        if (availableNow)
          w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        else w.start()
      if (availableNow) q.awaitTermination() else { q.processAllAvailable() }
      q.stop()
      q.recentProgress.foreach { p =>
        println(s"$label batch=${p.batchId} rows=${p.numInputRows} " +
          s"watermark=${p.eventTime.get("watermark")}")
        p.sources.foreach(src =>
          println(s"$label   src rows=${src.numInputRows} ${src.description.take(90)}"))
      }
      val n = spark.table(s"ojp_$label").count()
      val nulls = spark.table(s"ojp_$label").where(col("purchase_id").isNull).count()
      println(s"$label TOTAL=$n NULLS=$nulls (the TRAP: 209/204, not 210/205)")
      println(s"$label has996=" + spark.table(s"ojp_$label")
        .where(col("click_id") === 996).count())
    }
    run("avnow", availableNow = true)
    run("pall", availableNow = false)
    spark.stop()
  }
}
