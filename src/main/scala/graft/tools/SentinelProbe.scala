package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
object SentinelProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "sentinel-probe")
    import spark.implicits._
    val dir = Files.createTempDirectory("sent_probe")
    Seq((-1L, 4102444800000000000L, -1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val events = "/root/testdata/sf0.001"

    def run(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val q = df.writeStream.format("memory").queryName(label).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val n = spark.table(label).count()
      val neg = spark.table(label).where(col("user_id") < 0).count()
      println(s"PROBE $label total=$n sentinel_rows=$neg")
    }

    def union() = EventStreams.readStream(spark, events, globFilter = Some("events.parquet"))
      .unionByName(EventStreams.readStream(spark, dir.toString, globFilter = Some("*.parquet")))

    run("u_plain")(union())
    run("u_where")(union().where(col("event_type") === "click"))
    run("u_select")(union()
      .where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours"))
    spark.stop()
  }
}
/** Companion reproducer to [[OuterJoinProbe]]: the same left-outer
  * pipeline WITH the sentinel filter inside the streaming plan, built
  * from a shared sentinel dir — prints TOTAL=209 (the pushdown trap) and
  * per-source rows=0 for the sentinel sources.
  */
object SentinelJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "sentinel-join-probe")
    import spark.implicits._
    val dir = Files.createTempDirectory("sent_probe2")
    Seq((-1L, 4102444800000000000L, -1L, "click", 0.0, "{}"),
        (-2L, 4102444800000000000L, -2L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val events = "/root/testdata/sf0.001"
    def side(t: String) = EventStreams.readStream(spark, events, globFilter = Some("events.parquet"))
      .unionByName(EventStreams.readStream(spark, dir.toString, globFilter = Some("*.parquet")))
      .where(col("event_type") === t)
    val clicks = side("click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = side("purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") && col("p_ts") >= col("c_ts")
        && col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .where(col("user_id") >= 0)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("sj").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    q.recentProgress.foreach { p =>
      println(s"SJ batch=${p.batchId} wm=${p.eventTime.get("watermark")}")
      p.sources.foreach(s => println(s"SJ   src=${s.numInputRows} ${s.description.take(70)}"))
    }
    println("SJ TOTAL=" + spark.table("sj").count() + " has996=" +
      spark.table("sj").where(col("click_id") === 996).count())
    spark.stop()
  }
}
