package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.EventStreams

/** Dev diagnostic: drive the stateful userSessions query across TWO
  * microbatches — updates must accumulate per user, and the event-time
  * timeout must be registered without breaking the update stream.
  */
object SessionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "sessions-demo")
    val dir = Files.createTempDirectory("demo_sess")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.readStream(spark, dir.toString)
      .selectExpr("user_id", "ts", "value")
      .as[EventStreams.UserEvent](org.apache.spark.sql.Encoders.product)
    val q = EventStreams.userSessions(stream)
      .writeStream.outputMode("update").format("memory").queryName("sess").start()
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT count(*), sum(n_events) FROM sess").first()
    println(s"BATCH1 updates=${afterB1.getLong(0)} events=${afterB1.getLong(1)}")
    // second file → second microbatch → per-user counts double
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    q.stop()
    val last = spark.sql(
      """SELECT max(n_events) FROM (
        |  SELECT user_id, max(n_events) AS n_events FROM sess GROUP BY user_id)""".stripMargin).first()
    println(s"AFTER_BATCH2 max_per_user_events=${last.getLong(0)}")
    println("STATE_TIMEOUT_MODE=EventTimeTimeout (query ran without IllegalArgument — watermark present)")
    spark.stop()
  }
}
