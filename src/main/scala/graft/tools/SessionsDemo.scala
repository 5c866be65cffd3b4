package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.EventStreams

/** Dev diagnostic: drive the stateful gapSessions query across TWO
  * microbatches — closed sessions must accumulate in the append sink,
  * open sessions must carry across the batch boundary in keyed state,
  * and the event-time timeout must be registered without breaking the
  * append stream.
  */
object SessionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(appName = "sessions-demo")
    val dir = Files.createTempDirectory("demo_sess")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.readStream(spark, dir.toString)
      .selectExpr("user_id", "ts", "unix_micros(ts) AS ts_us", "event_id", "value")
      .as[EventStreams.SessionEvent](org.apache.spark.sql.Encoders.product)
    val q = EventStreams.gapSessions(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT count(*), coalesce(sum(n_events), 0) FROM sess").first()
    println(s"BATCH1 closed_sessions=${afterB1.getLong(0)} events_in_closed=${afterB1.getLong(1)}")
    // second file → second microbatch: replays the same time range, so
    // its events land at-or-before each user's open-session tail and
    // must merge into existing state (no watermark regression — the
    // watermark only advances), closing more sessions as gaps appear
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    q.stop()
    val afterB2 = spark.sql("SELECT count(*), max(session_idx) FROM sess").first()
    println(s"AFTER_BATCH2 closed_sessions=${afterB2.getLong(0)} max_session_idx=${afterB2.getLong(1)}")
    println("STATE_TIMEOUT_MODE=EventTimeTimeout (query ran without IllegalArgument — watermark present)")
    spark.stop()
  }
}
