package graft.tools
import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.EventStreams
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "stream-demo")
    val dir = Files.createTempDirectory("demo_events")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStreams.hourlyCounts(EventStreams.readStream(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory").queryName("demo").start()
    q.processAllAvailable(); q.stop()
    println("STREAM_ROWS=" + spark.table("demo").count())
    spark.table("demo").orderBy("hour", "event_type").show(5, false)
    // second batch: append a copy of the file -> incremental microbatch
    val q2 = EventStreams.hourlyCounts(EventStreams.readStream(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory").queryName("demo2").start()
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q2.processAllAvailable(); q2.stop()
    println("STREAM_ROWS_2FILES=" + spark.table("demo2").count())
    println("DOUBLED_N=" + spark.table("demo2").selectExpr("sum(n)").first().getLong(0))
    spark.stop()
  }
}
